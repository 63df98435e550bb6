package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._

/** Cell-local repair (r18, verdict item 2): [[SimilaritySearch
  * .rebalanceCells]] splits ONLY the cells drift actually skewed and
  * rewrites only the affected partitions — the bounded rung of the
  * repair ladder below the all-or-nothing [[SimilaritySearch
  * .retrainIvf]]. Load-bearing contracts:
  *   - correctness is untouched: the rebalanced artifact probes in the
  *     exact regime (every cell visited) BIT-EQUAL to the brute ranking
  *     — no row lost, duplicated, or mis-scored by the repair;
  *   - the repair is bounded: rows rewritten = the flagged + retired
  *     cells' volume (retired rows move as newcomer FILES — receivers
  *     never rewrite their own volume), a strict subset of the corpus;
  *   - skew drops; the center table stays dense (loadIvfIndex's
  *     positional array stays valid);
  *   - tombstones neither vote on the split geometry nor resurrect;
  *   - a balanced artifact is a no-op that touches no file.
  */
class RebalanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
    .select(col("vec_id"), col("embedding")).cache()

  private val dim = 64

  /** An off-distribution clump of `n` near-identical vectors — the
    * frozen quantizer piles all of them into ONE cell (the drift shape
    * [[SimilaritySearch.ivfSkewReport]] exists to catch). The small
    * per-dim jitter keeps ≥ 2 distinct vectors so a 2-means can split.
    */
  private def clump(n: Int): org.apache.spark.sql.DataFrame =
    (100000L until (100000L + n)).map { i =>
      (i, Array.tabulate(dim)(j =>
        5.0f + (if (j == 0) (i % 7) * 1e-3f else 0f)))
    }.toDF("vec_id", "embedding")

  private def skewedDir(tag: String, clumpN: Int = 4000): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-rebalance-$tag").toString
    SimilaritySearch.saveIvfIndex(
      SimilaritySearch.buildIvfIndex(emb, nlist = 8, persist = false), dir)
    SimilaritySearch.appendToIvfIndex(spark, dir, clump(clumpN))
    dir
  }

  test("rebalance splits the hot cell, drops skew, and preserves the exact ranking") {
    val dir = skewedDir("main")
    val before = SimilaritySearch.ivfSkewReport(spark, dir)
    assert(before.skew >= 4.0, s"construction should skew >= 4, got $before")
    // the iterative contract: round 1's optimal 2-clustering of the hot
    // cell separates clump from background scatter (barely moving
    // skew), round 2 splits the now-pure clump by its jitter classes —
    // each round bounded by that round's flagged volume
    val report = SimilaritySearch.rebalanceCells(spark, dir)
    assert(report.changed && report.splitCells.nonEmpty)
    // bounded: each round rewrites the affected partitions, not the
    // corpus — here the flagged + retired cells only
    assert(report.rowsRewritten < report.totalRows,
      s"repair rewrote the whole corpus: $report")
    val report2 = SimilaritySearch.rebalanceCells(spark, dir)
    assert(report2.skewAfter < before.skew / 1.5,
      s"two rounds should visibly drop skew: $before -> $report2")
    // the arithmetic skew-after matches a ground-truth re-measure
    val after = SimilaritySearch.ivfSkewReport(spark, dir)
    assert(math.abs(after.skew - report2.skewAfter) < 1e-9,
      s"derived skewAfter ${report2.skewAfter} != measured ${after.skew}")
    assert(after.nlist == report2.nlistAfter)
    // correctness: exact regime (probe every cell) == brute ranking
    val live = emb.unionByName(clump(4000))
    val q = emb.filter(col("vec_id") < 5)
      .unionByName(clump(4000).filter(col("vec_id") < 100003L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSeq
    val re = SimilaritySearch.loadIvfIndex(spark, dir, persist = false)
    assert(rows(SimilaritySearch.ivfProbe(re, q, k = 5,
        nprobe = report2.nlistAfter)) ==
      rows(SimilaritySearch.bruteForceTopK(live, q, 5)),
      "exact-regime probe of the rebalanced artifact diverged from brute")
    // the dense-center-table invariant the positional load depends on
    assert(re.centers.length == report2.nlistAfter)
  }

  test("starved cells retire: their ids are reused and their rows re-home") {
    val dir = skewedDir("retire")
    val report = SimilaritySearch.rebalanceCells(spark, dir)
    // the construction leaves the 8 original cells far below the
    // post-clump mean, so the split child reuses a retired id and the
    // table does NOT grow
    assert(report.retiredCells.nonEmpty,
      s"construction should starve at least one cell: $report")
    assert(report.nlistAfter == report.nlistBefore,
      s"child should fill the retired slot: $report")
    // no row lost in the re-home: total occupancy is conserved
    val total = spark.read.parquet(s"$dir/assigned").count()
    assert(total == report.totalRows, s"rows lost: $total vs $report")
  }

  test("tombstoned rows do not vote on the split geometry but stay tombstoned") {
    val dir = skewedDir("tomb")
    SimilaritySearch.deleteFromAnnIndex(spark, dir, Seq(100001L, 3L))
    val report = SimilaritySearch.rebalanceCells(spark, dir)
    assert(report.changed)
    val re = SimilaritySearch.loadIvfIndex(spark, dir, persist = false)
    val q = clump(4000).filter(col("vec_id") === 100005L)
    val got = SimilaritySearch.ivfProbe(re, q, k = 200,
        nprobe = report.nlistAfter)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert(!got.contains(100001L) && !got.contains(3L),
      "tombstoned ids resurfaced after rebalance")
    // and compaction still folds them afterwards
    SimilaritySearch.compactAnnIndex(spark, dir)
    assert(SimilaritySearch.loadIvfIndex(spark, dir, persist = false)
      .assigned.filter(col("neighbor_id").isin(100001L, 3L)).count() == 0)
  }

  test("a balanced artifact is a no-op that touches no file") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rebalance-noop").toString
    SimilaritySearch.saveIvfIndex(
      SimilaritySearch.buildIvfIndex(emb, nlist = 8, persist = false), dir)
    val centersBefore = new java.io.File(s"$dir/centers")
      .listFiles().map(f => f.getName -> f.lastModified).toSet
    val report = SimilaritySearch.rebalanceCells(spark, dir)
    assert(!report.changed && report.nlistAfter == 8 &&
      report.rowsRewritten == 0L)
    assert(report.skewBefore == report.skewAfter)
    val centersAfter = new java.io.File(s"$dir/centers")
      .listFiles().map(f => f.getName -> f.lastModified).toSet
    assert(centersBefore == centersAfter, "no-op rebalance touched files")
  }

  test("streamed layouts are refused with the routing message") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rebalance-streamed").toString
    graft.streaming.StreamingVecIndex.freezeCenters(spark, dir,
      SimilaritySearch.buildIvfIndex(emb, nlist = 4,
        persist = false).centers)
    graft.streaming.StreamingVecIndex.applyBatch(emb, 0L, dir)
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.rebalanceCells(spark, dir)
    }
    assert(e.getMessage.contains("compactTo"))
  }
}
