package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size overlapping token-window chunking — the RETRIEVAL chunker
  * beside the family's other two granularities ([[SeqPack]] packs training
  * sequences, [[Cdc]] cuts edit-stable chunks for dedup): a RAG corpus is
  * chunked into windows small enough to embed and retrieve, with overlap
  * so answers straddling a boundary survive in at least one chunk. Chunk
  * `c` of a document covers tokens `[c·stride, c·stride + size)` with
  * `stride = size − overlap`; the chunk count is `1` for docs of ≤ `size`
  * tokens, else `1 + ceil((n − size)/stride)` — the standard tail rule
  * (the last window is the first one reaching the end; no window lies
  * wholly inside its predecessor).
  *
  * Everything is pure built-in Column expressions (split → sequence →
  * explode → slice → array_join) inside whole-stage codegen — no UDF, and
  * the split is let-bound once per row (the round-7 lambda-CSE
  * discipline), never recomputed per window. Chunk identity is the
  * (doc_id, chunk_idx) pair plus an md5 content hash, so chunk tables
  * feed [[Dedup.exact]]-style hash dedup and [[InvertedIndex.build]] /
  * embedding pipelines directly (`idCol = "chunk_uid"`).
  *
  * Scale shape: map-only — one projection, one explode with fan-out
  * tokens/stride per row, no shuffle, no state; the chunk table is the
  * same order of magnitude as the corpus. Fully SQL-replayable
  * (generate_series + list_slice), so the gates are FULL oracles.
  */
object Chunker {

  /** One row per (doc, window): doc_id, chunk_idx, chunk_uid, token_start,
    * n_tokens, chunk_text, chunk_hash.
    */
  def chunk(docs: DataFrame, size: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val stride = size - overlap
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    val nChunks = when(n <= size, lit(1))
      .otherwise(lit(1) + ceil((n - lit(size)).cast("double") / stride)
        .cast("int"))
    val start = col("chunk_idx") * stride
    val piece = slice(col("__toks"), start + 1, lit(size))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat(col("doc_id"), lit("#"), col("chunk_idx")).as("chunk_uid"),
        start.cast("long").as("token_start"),
        org.apache.spark.sql.functions.size(piece).cast("long").as("n_tokens"),
        array_join(piece, " ").as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  /** Per-group chunking report over the full corpus (bounded output):
    * documents, chunks, token sums, mean chunk length ×1e6 (exact integer
    * arithmetic — the monitoring row a chunking job publishes).
    */
  def chunkStats(docs: DataFrame, size: Int, overlap: Int,
      groupCol: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ch = chunk(docs.select(col(idCol), col(groupCol), col(textCol)),
      size, overlap, idCol, textCol)
      .join(docs.select(col(idCol).cast("long").as("doc_id"),
        col(groupCol).as("__g")), Seq("doc_id"))
    ch.groupBy(col("__g").as(groupCol))
      .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("n_chunks"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        floor(sum(col("n_tokens")).cast("double") * lit(1000000.0) /
            count(lit(1)).cast("double"))
          .cast("long").as("mean_len_ppm"))
  }
}
