package graft

import graft.operators.CmsSketch
import org.apache.spark.sql.functions._

/** Count-Min sketch: one-sided bound, ε-accuracy on a real corpus, and the
  * bit-parity-under-any-partitioning property the elementwise merge buys.
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 1024

  private def wordsDf = Tables.documents(spark, sf001)
    .select(explode(split(col("text"), " ")).as("w"))

  test("est >= true for every key, and within eps*N on the real corpus") {
    val words = wordsDf.cache()
    val table = words.agg(CmsSketch.sketch(col("w"), D, W))
      .collect()(0).getSeq[Long](0).toArray
    val exact = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    words.unpersist()
    val n = exact.map(_._2).sum
    val epsN = math.ceil(math.E / W * n).toLong // theoretical per-row bound
    var violations = 0
    exact.foreach { case (k, true_n) =>
      val est = CmsSketch.cmsEstimate(table, k, D, W)
      assert(est >= true_n, s"under-count for '$k': est $est < true $true_n")
      if (est > true_n + epsN) violations += 1
    }
    // the eps bound holds per key with prob 1-delta; allow the delta tail
    assert(violations <= math.max(1, exact.length / 20),
      s"$violations/${exact.length} keys exceed eps*N=$epsN")
  }

  test("sketch is bit-identical under any partitioning (exact merge associativity)") {
    val words = wordsDf
    def build(parts: Int): Seq[Long] =
      words.repartition(parts).agg(CmsSketch.sketch(col("w"), D, W))
        .collect()(0).getSeq[Long](0)
    val one = build(1)
    assert(one == build(7) && one == build(32),
      "partitioning changed the sketch — merge not exactly associative")
  }

  test("per-source sketch artifacts sum to the global sketch (artifact union)") {
    // the HLL-union pattern for CMS: keep one sketch per source/day as a
    // persisted artifact, answer whole-corpus point queries by elementwise
    // sum — exact associativity makes the union EQUAL the single-pass
    // sketch, not an approximation of it
    val sw = Tables.documents(spark, sf001)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val global = sw.agg(CmsSketch.sketch(col("w"), D, W))
      .collect()(0).getSeq[Long](0)
    val perSource = sw.groupBy(col("source"))
      .agg(CmsSketch.sketch(col("w"), D, W).as("t"))
      .collect().map(_.getSeq[Long](1))
    val unioned = perSource.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    assert(unioned == global, "artifact union diverged from the single pass")
  }

  test("row hashes are per-row polynomials — pinned values, row independence") {
    // pinned against the BigInt recurrence the DuckDB twin replays
    // (Exact.POLYHASH(31+2r) % w); the empty string folds to bucket 0
    assert((0 until 4).map(CmsSketch.bucketOf("the", _, 1024)) ==
      Seq(113, 833, 433, 961))
    assert((0 until 4).map(CmsSketch.bucketOf("hello", _, 1024)) ==
      Seq(210, 116, 110, 944))
    assert((0 until 4).map(CmsSketch.bucketOf("", _, 1024)) == Seq(0, 0, 0, 0))
    // row independence in the concrete sense ADVICE flagged: items that
    // collide in one row must not be forced to collide in every row
    // (the old single-murmur-base scheme collided globally). Check over a
    // vocabulary: no pair collides in ALL 4 rows.
    val vocab = (0 until 2000).map(i => s"tok$i")
    val sigs = vocab.map(v => (0 until 4).map(CmsSketch.bucketOf(v, _, 1024)))
    assert(sigs.distinct.size == vocab.size,
      "two distinct items collide in every row — rows are not independent")
  }

  test("unseen keys estimate only collision mass; empty sketch estimates zero") {
    val empty = new Array[Long](D * W)
    assert(CmsSketch.cmsEstimate(empty, "anything", D, W) == 0L)
    val t = new Array[Long](D * W)
    CmsSketch.cmsInsert(t, "aaa", D, W, 5L)
    CmsSketch.cmsInsert(t, "bbb", D, W, 3L)
    assert(CmsSketch.cmsEstimate(t, "aaa", D, W) >= 5L)
    assert(CmsSketch.cmsEstimate(t, "bbb", D, W) >= 3L)
    // an unseen key reads at most the colliding mass (usually 0 at d=4)
    assert(CmsSketch.cmsEstimate(t, "zzz-unseen", D, W) <= 8L)
  }
}
