package graft

import graft.operators.SemDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated cluster regions on distinct axis triples plus one
  // planted near-duplicate pair inside each, placed ~45 degrees OFF the
  // seed direction so the seed vector itself is not a near-dup of the pair
  // (cos seed-pair ~ 0.70, cos within-pair ~ 0.99997). Vectors are
  // integer-valued so every distance/cosine comparison in the pass is
  // exact.
  private def planted: DataFrame = {
    def v(vals: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(8)(0.0)
      vals.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    Seq(
      // cluster around axis 0
      (0L, v(0 -> 1000.0)),                // seed center A
      (10L, v(0 -> 700.0, 1 -> 700.0)),    // near-dup of 11
      (11L, v(0 -> 700.0, 1 -> 710.0)),    // near-dup of 10, farther out
      (12L, v(0 -> 600.0, 2 -> 800.0)),    // distinct member (cos to 10 ~ 0.42)
      // cluster around axis 4
      (1L, v(4 -> 1000.0)),                // seed center B
      (20L, v(4 -> 700.0, 5 -> 700.0)),    // near-dup of 21
      (21L, v(4 -> 700.0, 5 -> 712.0)),
      (22L, v(4 -> 600.0, 6 -> 800.0))     // distinct member
    ).toDF("vec_id", "embedding")
  }

  private val centers: Seq[Seq[Double]] = {
    val a = Array.fill(8)(0.0); a(0) = 1000.0
    val b = Array.fill(8)(0.0); b(4) = 1000.0
    Seq(a.toSeq, b.toSeq)
  }

  private def keepMap(df: DataFrame): Map[Long, Boolean] =
    df.select($"vec_id", $"keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  test("planted near-dup pairs lose exactly the closer-to-centroid member") {
    val out = SemDedup.semDedup(planted, centers, tau = 0.98)
    val keep = keepMap(out)
    // 11 is farther from the centroid than 10 -> 10 pruned, 11 kept
    assert(!keep(10L) && keep(11L))
    assert(!keep(20L) && keep(21L))
    // distinct members and the on-center vectors survive
    assert(keep(0L) && keep(1L) && keep(12L) && keep(22L))
    // assignment landed on the right clusters
    val clusters = out.select($"vec_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 10L, 11L, 12L).forall(clusters(_) == 0L))
    assert(Seq(1L, 20L, 21L, 22L).forall(clusters(_) == 1L))
  }

  test("keep count is monotone non-increasing as tau tightens") {
    def kept(tau: Double): Long =
      SemDedup.semDedup(planted, centers, tau).filter($"keep").count()
    assert(kept(0.999) >= kept(0.9))
    assert(kept(0.9) >= kept(0.5))
    assert(kept(0.5) >= kept(0.1))
  }

  test("assignment ties break to the lowest cluster id") {
    // equidistant from both centers
    val tie = Seq((99L, {
      val a = Array.fill(8)(0.0); a(0) = 500.0; a(4) = 500.0; a.toSeq
    })).toDF("vec_id", "embedding")
    val out = SemDedup.assign(tie, centers)
    assert(out.head().getAs[Long]("cluster_id") == 0L)
  }

  test("overfull-cluster guard suppresses prune pairs instead of exploding") {
    val out = SemDedup.semDedup(planted, centers, tau = 0.98, maxClusterSize = 2)
    // every cluster has 4 members > cap 2 -> no pairs generated, all kept
    assert(keepMap(out).values.forall(identity))
  }

  test("k-means form prunes the same planted near-dups as the seed-center form") {
    // nlist=2 k-means on this data recovers the two axis clusters, so the
    // prune decisions for the planted pairs must agree with the oracle-
    // verified seed-center pass: one of each near-dup pair dropped, the
    // isolated members kept.
    val out = SemDedup.semDedupKMeans(
      planted.select($"vec_id",
        transform($"embedding", _.cast("float")).as("embedding")),
      nlist = 2, tau = 0.98)
    val keep = keepMap(out)
    assert(Seq(10L, 11L).count(keep) == 1)
    assert(Seq(20L, 21L).count(keep) == 1)
    assert(keep(0L) && keep(1L) && keep(12L) && keep(22L))
  }
}
