package graft

import graft.operators.InvertedIndex
import graft.streaming.StreamingLexIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming index ingest vs the from-scratch build: micro-batch deltas
  * re-aggregate to the exact index, replayed batches are idempotent
  * (the exactly-once-by-partition-overwrite contract), and the probe
  * plan still prunes on the bucket partition level.
  */
class StreamingLexIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark table scan"), (2L, "table merge join"),
    (3L, "spark join hash"), (4L, "scan scan scan"),
    (5L, "merge table spark"), (6L, "hash probe build"),
    // doc 7 holds "probe"'s max tf while doc 6 keeps the term alive —
    // deleting 7 is the case where the tombstone-carried max_tf bound
    // goes LOOSE and compactTo must re-derive the exact statistic
    (7L, "probe probe probe table"))

  private def probe(idx: InvertedIndex.LexIndex): Seq[(Long, Long)] = {
    val terms = idx.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    InvertedIndex.bm25TopK(idx, terms, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("MemoryStream ingest across batches probes bit-identically to a rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamlex-mem").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-streamlex-ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val query = StreamingLexIndex.sink(docs, dir, ckpt).start()
    try {
      corpus.grouped(2).foreach { g =>
        stream.addData(g: _*); query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = StreamingLexIndex.load(spark, dir)
    val rebuilt = InvertedIndex.build(corpus.toDF("doc_id", "text"))
    assert(streamed.n == rebuilt.n && streamed.sdl == rebuilt.sdl)
    assert(probe(streamed) == probe(rebuilt))
    // df merged exactly across batch deltas
    val sDf = streamed.termDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rDf = rebuilt.termDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sDf == rDf)
    // folding the batch partitions into the compact layout changes file
    // geometry, never a score
    val folded = java.nio.file.Files
      .createTempDirectory("graft-streamlex-fold").toString
    StreamingLexIndex.compactTo(spark, dir, folded)
    val compactIdx = InvertedIndex.load(spark, folded)
    assert(compactIdx.n == streamed.n && compactIdx.sdl == streamed.sdl)
    assert(probe(compactIdx) == probe(streamed))
    assert(!compactIdx.postings.columns.contains("batch"))
  }

  test("replayed batch is idempotent: same batch id overwrites, never double-counts") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamlex-replay").toString
    val slices = corpus.grouped(3).toSeq
    slices.zipWithIndex.foreach { case (g, i) =>
      StreamingLexIndex.applyBatch(g.toDF("doc_id", "text"), i.toLong, dir)
    }
    val before = StreamingLexIndex.load(spark, dir)
    val beforeProbe = probe(before)
    val (beforeN, beforePostings) = (before.n, before.postings.count())
    // a recovery replay re-delivers batch 1 verbatim
    StreamingLexIndex.applyBatch(
      slices(1).toDF("doc_id", "text"), 1L, dir)
    val after = StreamingLexIndex.load(spark, dir)
    assert(after.n == beforeN && after.sdl == before.sdl)
    assert(after.postings.count() == beforePostings)
    assert(probe(after) == beforeProbe)
  }

  test("auto segment-merge mid-stream: bit-identical probes, collapsed segments") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamlex-merge").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-streamlex-merge-ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    // 6 docs in 6 single-doc batches, threshold 3: merges MUST fire
    // mid-stream (batches 0..1 fold when batch 2 lands, etc.)
    val query = StreamingLexIndex.sink(docs, dir, ckpt, mergeEvery = 3).start()
    try {
      corpus.foreach { d => stream.addData(d); query.processAllAvailable() }
    } finally query.stop()
    val merged = StreamingLexIndex.load(spark, dir)
    val rebuilt = InvertedIndex.build(corpus.toDF("doc_id", "text"))
    assert(merged.n == rebuilt.n && merged.sdl == rebuilt.sdl)
    assert(probe(merged) == probe(rebuilt))
    val mDf = merged.termDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("max_tf")))
      .toSet
    val rDf = rebuilt.termDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("max_tf")))
      .toSet
    assert(mDf == rDf, "df/max_tf must merge exactly across segments")
    // the manifest governs and the live segment count is bounded by the
    // threshold + the unfolded tail
    val live = StreamingLexIndex.liveSegments(spark, dir)
    assert(live.size < 6, s"no merge happened: $live")
    assert(live.exists(_ < 0), s"no merged segment in $live")
    // WAND probe works on the stream-loaded index (max_tf carried)
    val terms = merged.termDf.orderBy($"df", $"term").limit(2)
      .collect().map(_.getString(0)).toSeq
    val pruned = InvertedIndex.bm25TopKPruned(merged, terms, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = InvertedIndex.bm25TopK(merged, terms, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pruned == direct)
  }

  test("streamed artifact serves the spell dictionary; merge folds it; legacy falls back") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamlex-suggest").toString
    corpus.grouped(2).zipWithIndex.foreach { case (g, i) =>
      StreamingLexIndex.applyBatch(g.toDF("doc_id", "text"), i.toLong, dir)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    // parity oracle: the same probe against the build-only index (per-call
    // vocabulary derivation over the full corpus)
    val want = rows(InvertedIndex.suggestTerms(
      InvertedIndex.build(corpus.toDF("doc_id", "text")), Seq("spark"), 3))
    val streamed = StreamingLexIndex.load(spark, dir)
    assert(streamed.suggestKeys.isDefined,
      "streamed artifact must carry the persisted dictionary")
    val served = InvertedIndex.suggestTerms(streamed, Seq("spark"), 3)
    assert(rows(served) == want)
    assert(want.nonEmpty && want.map(_._2).contains("spark"))
    // the served plan reads the persisted relation with NO termDf join:
    // per-batch partial dfs re-sum over the pruned buckets alone
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("suggest"), "probe must scan the persisted dictionary")
    assert(!plan.contains("termdf"), "df path must not join the vocabulary relation")
    // a legacy segment (no suggest delta) breaks coverage: fall back to
    // derivation, same rows
    val seg1 = new java.io.File(s"$dir/suggest/batch=1")
    assert(seg1.isDirectory)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(seg1)
    val legacy = StreamingLexIndex.load(spark, dir)
    assert(legacy.suggestKeys.isEmpty,
      "incomplete dictionary coverage must fall back, not under-suggest")
    assert(rows(InvertedIndex.suggestTerms(legacy, Seq("spark"), 3)) == want)
    // the merge fold re-derives the dictionary from the folded termDf —
    // coverage is restored and the served probe returns
    assert(StreamingLexIndex.maybeMerge(spark, dir, 2, 3L))
    val merged = StreamingLexIndex.load(spark, dir)
    assert(merged.suggestKeys.isDefined, "merge must fold the dictionary")
    assert(rows(InvertedIndex.suggestTerms(merged, Seq("spark"), 3)) == want)
  }

  test("merge is replay-safe: re-delivered current batch + re-merge change nothing") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamlex-merge-replay").toString
    corpus.grouped(2).zipWithIndex.foreach { case (g, i) =>
      StreamingLexIndex.applyBatch(g.toDF("doc_id", "text"), i.toLong, dir)
      StreamingLexIndex.maybeMerge(spark, dir, 3, i.toLong)
    }
    val before = StreamingLexIndex.load(spark, dir)
    val (beforeProbe, beforeN) = (probe(before), before.postings.count())
    val liveBefore = StreamingLexIndex.liveSegments(spark, dir)
    // the LAST batch is the only one Structured Streaming can re-deliver;
    // replay re-applies it AND re-runs the merge decision
    val groups = corpus.grouped(2).toSeq
    val lastId = groups.length - 1L
    StreamingLexIndex.applyBatch(groups.last.toDF("doc_id", "text"),
      lastId, dir)
    StreamingLexIndex.maybeMerge(spark, dir, 3, lastId)
    val after = StreamingLexIndex.load(spark, dir)
    assert(after.n == before.n && after.sdl == before.sdl)
    assert(after.postings.count() == beforeN)
    assert(probe(after) == beforeProbe)
    assert(StreamingLexIndex.liveSegments(spark, dir) == liveBefore)
  }

  test("empty batches are no-ops; probe plan prunes bucket partitions under batch=") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamlex-prune").toString
    StreamingLexIndex.applyBatch(corpus.toDF("doc_id", "text"), 0L, dir)
    StreamingLexIndex.applyBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 1L, dir)
    val idx = StreamingLexIndex.load(spark, dir)
    assert(idx.n == corpus.length)
    val plan = InvertedIndex.bm25TopK(idx, Seq("spark"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition pruning under batch= layout:\n$plan")
  }

  test("takedown on the LIVE streamed index: tombstones apply at load, survive merge, fold at compactTo") {
    // the batch artifact and StreamingVecIndex already had the delete
    // story; r14 closes the streamed LEXICAL gap — a takedown must not
    // wait for a compactTo fold
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamlex-tomb").toString
    corpus.grouped(2).zipWithIndex.foreach { case (g, i) =>
      StreamingLexIndex.applyBatch(g.toDF("doc_id", "text"), i.toLong, dir)
    }
    val dead = Seq(2L, 5L, 7L, 999L) // three live docs (7 holds a term's
    // max tf with a survivor keeping the term alive) + one unknown id
    InvertedIndex.delete(spark, dir, dead)
    InvertedIndex.delete(spark, dir, Seq(2L)) // idempotent re-delete
    val survivors = corpus.filterNot(d => dead.contains(d._1))
    val rebuilt = InvertedIndex.build(survivors.toDF("doc_id", "text"))
    val tombed = StreamingLexIndex.load(spark, dir)
    assert(tombed.n == rebuilt.n && tombed.sdl == rebuilt.sdl,
      s"stats not adjusted: n=${tombed.n}/${rebuilt.n} sdl=${tombed.sdl}/${rebuilt.sdl}")
    assert(probe(tombed) == probe(rebuilt),
      "tombstoned streamed probe diverged from survivor rebuild")
    // df adjusted exactly (dead docs' contributions subtracted)
    val tDf = tombed.termDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rDf = rebuilt.termDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tDf == rDf)
    // a segment merge must not lose the deletions (the tombstone
    // relation is not a segment; the fold preserves all rows and load
    // re-applies)
    StreamingLexIndex.maybeMerge(spark, dir, 2, 3L)
    val afterMerge = StreamingLexIndex.load(spark, dir)
    assert(probe(afterMerge) == probe(rebuilt),
      "segment merge lost the tombstones")
    assert(afterMerge.n == rebuilt.n)
    // compactTo folds the deletions into the clean compact artifact
    val folded = java.nio.file.Files
      .createTempDirectory("graft-streamlex-tombfold").toString
    StreamingLexIndex.compactTo(spark, dir, folded)
    val compactIdx = InvertedIndex.load(spark, folded)
    assert(compactIdx.n == rebuilt.n && probe(compactIdx) == probe(rebuilt))
    assert(compactIdx.postings
      .filter(col("doc_id").isin(dead: _*)).count() == 0,
      "compactTo kept dead docs' postings")
    // r15: compactTo re-derives the EXACT max_tf over surviving postings
    // (the InvertedIndex.compact discipline) — the pre-fix fold persisted
    // the tombstone-carried stale max permanently. "probe"'s max was 3
    // (dead doc 7); the surviving max is doc 6's tf = 1.
    def stats(idx: InvertedIndex.LexIndex) = idx.termDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats(compactIdx) == stats(rebuilt),
      "compactTo termDf (df, max_tf) diverged from the exact rebuild")
  }
}
