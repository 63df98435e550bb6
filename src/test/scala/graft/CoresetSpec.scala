package graft

import graft.operators.Coreset
import org.apache.spark.sql.functions._

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Driver-side reference: the same greedy farthest-point traversal. */
  private def greedyRef(pts: Seq[(Long, Array[Double])], k: Int)
      : Seq[(Long, Double)] = {
    val seed = pts.minBy(_._1)
    var sel = Vector((seed._1, 0.0))
    val minD = scala.collection.mutable.HashMap(
      pts.map(p => p._1 -> l2sq(p._2, seed._2)): _*)
    val byId = pts.toMap
    while (sel.length < k) {
      val (nid, nd) = minD.toSeq.filterNot(e => sel.exists(_._1 == e._1))
        .maxBy { case (id, d) => (d, -id) }
      sel :+= ((nid, nd))
      val nv = byId(nid)
      pts.foreach(p => minD(p._1) = math.min(minD(p._1), l2sq(p._2, nv)))
    }
    sel
  }

  private def collected(sf: String): Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
      .toSeq

  test("selection matches the driver-side greedy traversal id-for-id") {
    val pts = collected(sf001)
    val k = 6
    val got = Coreset.kCenter(Tables.embeddings(spark, sf001), k,
        idCol = "vec_id", vecCol = "embedding")
      .orderBy($"round").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val want = greedyRef(pts, k)
    assert(got.map(_._1) == want.map(_._1),
      s"ids diverged: got ${got.map(_._1)}, want ${want.map(_._1)}")
    got.zip(want).foreach { case ((_, d1), (_, d2)) =>
      assert(math.abs(d1 - d2) <= 1e-9 * math.max(1.0, d2),
        s"selection distance drifted: $d1 vs $d2")
    }
  }

  test("selection distances are non-increasing (the greedy certificate)") {
    val ds = Coreset.kCenter(Tables.embeddings(spark, sf001), 8,
        idCol = "vec_id", vecCol = "embedding")
      .orderBy($"round").collect().map(_.getDouble(2)).drop(1)
    assert(ds.nonEmpty && ds.zip(ds.tail).forall { case (a, b) => a >= b },
      s"not non-increasing: ${ds.toSeq}")
  }

  test("coverage: every point sits within the last selection distance") {
    val pts = collected(sf001)
    val sel = Coreset.kCenter(Tables.embeddings(spark, sf001), 8,
        idCol = "vec_id", vecCol = "embedding")
      .orderBy($"round").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val centers = sel.map(s => pts.find(_._1 == s._1).get._2)
    val radius = sel.last._2
    val maxMin = pts.map(p => centers.map(c => l2sq(p._2, c)).min).max
    assert(maxMin <= radius + 1e-9,
      s"coverage violated: maxMin=$maxMin > lastSel=$radius")
  }

  test("partitioning does not change the selection") {
    val a = Coreset.kCenter(Tables.embeddings(spark, sf001), 5,
        idCol = "vec_id", vecCol = "embedding")
      .orderBy($"round").collect().map(_.getLong(0)).toSeq
    val b = Coreset.kCenter(
        Tables.embeddings(spark, sf001).repartition(7), 5,
        idCol = "vec_id", vecCol = "embedding")
      .orderBy($"round").collect().map(_.getLong(0)).toSeq
    assert(a == b, s"partitioning changed selection: $a vs $b")
  }

  test("k=1 returns just the seed; k larger than distinct rows is safe") {
    val one = Coreset.kCenter(Tables.embeddings(spark, sf001), 1,
        idCol = "vec_id", vecCol = "embedding").collect()
    assert(one.length == 1 && one(0).getLong(0) == 0L &&
      one(0).getDouble(2) == 0.0)
  }

  test("k beyond the distinct-vector count stops early with no duplicate centers") {
    // 3 rows but only 2 distinct vectors: once both are selected, the
    // farthest remaining minDist is 0 and selection must STOP rather than
    // re-emit an already-covered row as a fake center
    val df = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)), (2L, Seq(3.0, 4.0)))
      .toDF("id", "vec")
    val sel = Coreset.kCenter(df, 5).collect()
    assert(sel.length == 2, s"expected 2 centers, got ${sel.length}")
    assert(sel.map(_.getLong(0)).distinct.length == 2, "duplicate center ids")
  }

  test("empty input fails with a clear message, not IndexOutOfBounds") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Coreset.kCenter(empty, 3)
    }
    assert(e.getMessage.contains("empty"))
  }
}
