package graft

import graft.ml.PowerIter
import org.apache.spark.sql.functions._

class PowerIterSpec extends SparkSpec {
  import spark.implicits._

  private def quantized(sf: String) =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"),
        floor(col("col").cast("double") * lit(10000.0)).cast("long").as("q"))

  private lazy val (eigs, lams) = PowerIter.leadingTwo(quantized(sf001),
    dim = 64, iters = 10)
  private lazy val v = eigs.collect()
    .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
  private def comp(c: Int) = v.filter(_._1 == c).sortBy(_._2).map(_._3)

  test("d-bound guard: wide embeddings are rejected toward the MLlib path") {
    val e = intercept[IllegalArgumentException] {
      PowerIter.leadingTwoLocal(quantized(sf001), dim = 2048, iters = 1)
    }
    assert(e.getMessage.contains("MlOps.pca"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ml.LinearProbe.fitCg(
        quantized(sf001).withColumn("y", lit(1.0)), dim = 2048, rounds = 1)
    }
    assert(e2.getMessage.contains("logregCvAccuracy"))
  }

  test("gram explode is folded map-side: partial agg sits below the only exchange") {
    // the plan pin behind the scaladoc's cost model — the n·d² product
    // rows must be absorbed by a partial HashAggregate BEFORE any
    // exchange, so the shuffle carries partitions×d² rows, never n·d²
    import org.apache.spark.sql.types._
    val n = quantized(sf001).select(col("vec_id")).distinct().count()
    val y = PowerIter.centered(
      quantized(sf001).select(col("vec_id"), col("pos"), col("q")), n)
    val yA = col("a.y").cast(DecimalType(19, 0))
    val yB = col("b.y").cast(DecimalType(19, 0))
    val g = y.as("a").join(y.as("b"), "vec_id")
      .groupBy(col("a.pos").as("i"), col("b.pos").as("j"))
      .agg(sum((yA * yB).cast(DecimalType(38, 0))).as("gd"))
    val plan = g.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l =>
      l.contains("HashAggregate") && l.contains("partial_sum"))
    val joinIdx = lines.indexWhere(_.contains("Join"))
    assert(partialIdx >= 0 && joinIdx >= 0, s"shapes missing:\n$plan")
    // partial agg above (printed before) the join, and no exchange
    // between them — the explode never reaches a shuffle
    assert(partialIdx < joinIdx, s"partial agg not map-side:\n$plan")
    assert(!lines.slice(partialIdx + 1, joinIdx)
        .exists(_.contains("Exchange")),
      s"exchange between join and partial agg:\n$plan")
  }

  test("out-of-sample projection: all-rows landmarks reduce to the in-sample form") {
    val lf = quantized(sf001).select(col("vec_id"), col("pos"), col("q"))
    val solve = PowerIter.leadingTwoLocal(lf, dim = 64, iters = 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // landmarkFilter = everything → identical centering stats, so the
    // extension path must reproduce projectSquaredWith bit-for-bit
    assert(rows(PowerIter.projectSquaredOutOfSample(lf, lit(true), solve,
        col("vec_id") < 20)) ==
      rows(PowerIter.projectSquaredWith(lf, solve, col("vec_id") < 20)))
    // held-out rows get coordinates from the landmark-only model without
    // joining the landmark corpus per row (map-only: just csum + solve)
    val lmSolve = PowerIter.leadingTwoLocal(
      lf.filter(col("vec_id") % 4 =!= 3), dim = 64, iters = 10)
    val ext = PowerIter.projectSquaredOutOfSample(lf,
      col("vec_id") % 4 =!= 3, lmSolve, col("vec_id") % 4 === 3)
    assert(ext.select(col("vec_id")).distinct().count() ==
      lf.filter(col("vec_id") % 4 === 3)
        .select(col("vec_id")).distinct().count())
  }

  test("iterates are unit vectors and near-orthogonal after deflation") {
    Seq(1, 2).foreach { c =>
      val n2 = comp(c).map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-9, s"comp $c norm^2 = $n2")
    }
    // the testdata spectrum is nearly flat (random-ish 64-d), so 10 fixed
    // rounds leave residual mixing — the contract is exact replayability,
    // not convergence; bound the residual rather than demanding zero
    val dot = comp(1).zip(comp(2)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.1, s"v1 . v2 = $dot")
  }

  test("lambdas are positive and of one spectral magnitude") {
    // strict lam1 >= lam2 only holds at convergence; on a flat spectrum
    // the deflated direction can transiently score a hair higher
    val l = lams.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(l(1) > 0 && l(2) > 0)
    assert(l(1) >= 0.8 * l(2) && l(2) <= 1.25 * l(1),
      s"lam1 ${l(1)} vs lam2 ${l(2)} not same magnitude")
  }

  test("pc1 Rayleigh quotient matches MLlib's leading variance direction") {
    // project the centered quantized corpus on v1; its variance share must
    // be at least 90% of MLlib PCA's first explained-variance share
    val emb = Tables.embeddings(spark, sf001)
    val (_, evr) = graft.ml.MlOps.pca(emb, "embedding", k = 2)
    val lf = quantized(sf001)
    val n = lf.select(col("vec_id")).distinct().count()
    val y = PowerIter.centered(lf, n)
    val v1 = comp(1)
    val proj = y.collect().groupBy(_.getLong(0)).map { case (_, rows) =>
      rows.map(r => r.getLong(2).toDouble * v1(r.getInt(1))).sum
    }.toSeq
    val varProj = proj.map(s => s * s).sum
    val total = y.collect().map(r => math.pow(r.getLong(2).toDouble, 2)).sum
    val share = varProj / total
    assert(share >= 0.9 * evr.head,
      s"power-iteration share $share vs MLlib EVR ${evr.head}")
  }

  test("fixed-round solve is deterministic under repartitioning") {
    val lf = quantized(sf001)
    val (e2, _) = PowerIter.leadingTwo(lf.repartition(13), 64, 10)
    val again = e2.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(again.sortBy(t => (t._1, t._2)).toSeq ==
      v.sortBy(t => (t._1, t._2)).toSeq)
  }
}
