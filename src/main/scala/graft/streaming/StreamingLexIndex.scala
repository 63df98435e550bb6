package graft.streaming

import graft.operators.InvertedIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous ingest into a persisted inverted index — the streaming
  * sibling of [[graft.operators.InvertedIndex.append]]: each micro-batch
  * of (id, text) docs becomes a postings/doclens/termdf/meta DELTA
  * written under its own `batch=<id>` partitions, and [[load]]
  * re-aggregates across batches EXACTLY (term dfs and the (n, sdl) meta
  * are sums; doc ids are disjoint across batches — the append
  * contract), so a probe after any batch is bit-identical to a
  * from-scratch build over everything ingested so far.
  *
  * Exactly-once by IDEMPOTENCE, not a ledger: the batch-id partition is
  * the write's identity, and the write uses dynamic partition OVERWRITE
  * — a replayed micro-batch (foreachBatch is at-least-once across
  * failures) replaces its own partitions instead of double-counting
  * postings. This is the parquet answer to the transactional-sink
  * problem; a plain `mode("append")` here would silently corrupt df/n
  * on every recovery replay.
  *
  * 100 TB shape: per-batch work is the bounded delta build (one grouped
  * pass over the batch); the artifact grows by delta partitions with no
  * read-modify-write of history, and the serving probe still prunes on
  * the bucket partition level under `batch=`. Fold accumulated batches
  * into the compact [[graft.operators.InvertedIndex]] layout offline
  * when partition counts warrant it — the segment-merge rhythm.
  */
object StreamingLexIndex {

  /** Apply ONE micro-batch delta. Public (not an anonymous closure) so
    * the idempotence contract is directly testable: calling this twice
    * with the same `batchId` leaves the artifact byte-identical.
    */
  def applyBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    import spark.implicits._
    val delta = InvertedIndex.build(batch, idCol, textCol)
    def write(df: DataFrame, sub: String, parts: Seq[String]): Unit =
      df.withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch" +: parts: _*)
        .parquet(s"$dir/$sub")
    write(delta.postings, "postings", Seq("bucket"))
    write(delta.docLens, "doclens", Nil)
    write(delta.termDf, "termdf", Nil)
    write(Seq((delta.n, delta.sdl)).toDF("n", "sdl"), "meta", Nil)
  }

  /** The streaming writer: attach a checkpoint and `.start()` (or
    * `.trigger(AvailableNow)` for catch-up runs). foreachBatch because
    * the delta build is batch-relational work (grouped rollups + a
    * partitioned write), not row-at-a-time state.
    */
  def sink(docs: DataFrame, dir: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text")
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        applyBatch(b, id, dir, idCol, textCol))

  /** Assemble the live index across every ingested batch. The `batch`
    * partition column is dropped from the relations (it is the write's
    * identity, not index data); termdf and meta re-aggregate exactly as
    * [[graft.operators.InvertedIndex.load]] does for appended deltas.
    */
  def load(spark: SparkSession, dir: String): InvertedIndex.LexIndex = {
    val meta = spark.read.parquet(s"$dir/meta")
      .agg(sum(col("n")), sum(col("sdl"))).collect()(0)
    InvertedIndex.LexIndex(
      spark.read.parquet(s"$dir/postings").drop("batch"),
      spark.read.parquet(s"$dir/doclens").drop("batch"),
      spark.read.parquet(s"$dir/termdf").drop("batch")
        .groupBy(col("term")).agg(sum(col("df")).as("df")),
      meta.getLong(0), meta.getLong(1))
  }

  /** The segment-merge rhythm's offline half: fold every ingested batch
    * partition into the compact [[graft.operators.InvertedIndex]]
    * layout at `outDir` (one bucket-partitioned posting relation, merged
    * termdf, one meta row). Probes against the folded artifact are
    * bit-identical to probes against the live streaming layout — the
    * relations are the same; only the file geometry changes. Run it
    * when accumulated `batch=` partition counts start to tax listing
    * and planning; the stream keeps appending to `dir` meanwhile, and
    * the cut-over is the versioned-artifact-directory swap.
    */
  def compactTo(spark: SparkSession, dir: String, outDir: String): Unit =
    InvertedIndex.save(load(spark, dir), outDir)
}
