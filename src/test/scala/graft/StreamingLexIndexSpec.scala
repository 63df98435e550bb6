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
    (5L, "merge table spark"), (6L, "hash probe build"))

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
}
