package graft

import graft.ml.LinearProbe
import org.apache.spark.sql.functions._

class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  private def longForm(rows: Seq[(Long, Int, Array[Long])]) =
    rows.flatMap { case (id, label, q) =>
      q.zipWithIndex.map { case (v, p) => (id, label, p, v) }
    }.toDF("vec_id", "label", "pos", "q")

  test("separable blobs: the probe classifies near-perfectly") {
    val rnd = new scala.util.Random(11)
    val dim = 8
    val rows = (0 until 120).map { i =>
      val pos = i % 2 == 0
      val c = if (pos) 3000.0 else -3000.0
      (i.toLong, if (pos) 0 else 9,
        Array.tabulate(dim)(_ => (c + rnd.nextGaussian() * 300).toLong))
    }
    val rep = LinearProbe.probeReport(longForm(rows), dim, rounds = 8,
      posBelow = 5).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val correct = rep.values.map(_._2).sum
    val total = rep.values.map(_._1).sum
    assert(correct >= total * 95 / 100, s"probe got $correct/$total")
  }

  test("testdata probe beats chance and matches the gate row shape") {
    val out = SparkEntry.queries("vx_linear_probe_quantized")(spark, sf001)
      .collect()
    assert(out.length == 10)
    val correct = out.map(_.getAs[Long]("n_correct")).sum
    val total = out.map(_.getAs[Long]("n")).sum
    assert(correct.toDouble / total > 0.55,
      s"probe accuracy ${correct.toDouble / total} at chance")
  }

  test("fixed-round CG is deterministic under repartitioning") {
    val lf = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("pos"),
        floor(col("col").cast("double") * lit(10000.0)).cast("long").as("q"))
    def run(df: org.apache.spark.sql.DataFrame) =
      LinearProbe.probeReport(df, 64, 8, 5).orderBy("label").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    assert(run(lf) == run(lf.repartition(17)))
  }

  test("CG solves the ridge system on well-conditioned input") {
    // residual check: ||Aw - b|| should collapse after 8 rounds when the
    // system is small and well-conditioned
    val rnd = new scala.util.Random(3)
    val dim = 6
    val rows = (0 until 80).map { i =>
      (i.toLong, if (i % 2 == 0) 0 else 9,
        Array.tabulate(dim)(_ => rnd.nextInt(2000).toLong - 1000L))
    }
    val lf = longForm(rows).withColumn("y",
      when(col("label") < 5, 1.0).otherwise(-1.0))
    val w = LinearProbe.fitCg(
      lf.select(col("vec_id"), col("pos"), col("q"), col("y")), dim, 8)
    // rebuild A, b in the driver and measure the residual
    val data = rows.map { case (_, l, q) => (q, if (l < 5) 1.0 else -1.0) }
    val scale = LinearProbe.GramScale
    val a = Array.tabulate(dim, dim) { (i, j) =>
      data.map { case (q, _) => q(i).toDouble * q(j) }.sum / scale +
        (if (i == j) 1.0 else 0.0)
    }
    val b = Array.tabulate(dim)(i =>
      data.map { case (q, y) => q(i) * y }.sum / scale)
    val wv = w.sortBy(_._1).map(_._2).toArray
    val res = Array.tabulate(dim)(i =>
      a(i).zip(wv).map { case (x, y) => x * y }.sum - b(i))
    val rn = math.sqrt(res.map(x => x * x).sum)
    val bn = math.sqrt(b.map(x => x * x).sum)
    assert(rn <= 1e-6 * math.max(bn, 1.0), s"residual $rn vs ||b|| $bn")
  }
}
