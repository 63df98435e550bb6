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
  * Two token granularities share that geometry: [[chunk]] counts
  * WHITESPACE tokens (pure built-in Column expressions — split → sequence
  * → explode → slice → array_join — inside whole-stage codegen, no UDF,
  * with the split let-bound once per row per the round-7 lambda-CSE
  * discipline), and [[chunkByBpe]] counts BPE TOKENS under a trained
  * [[BpeTrain]] merge table — the budget an embedding model actually
  * enforces. A whitespace budget systematically under-fills a BPE-token
  * budget on real text (one word ≥ one BPE token), so a RAG user sizing
  * chunks for an embedder's context window wants the BPE form.
  *
  * Null `text` yields ONE EMPTY CHUNK (text is coalesced to ""), never a
  * silent drop — a chunk table must account for every corpus document or
  * downstream coverage accounting silently under-counts (the same
  * silent-drop poisoning [[graft.sources.JsonlIngest]]'s contract exists
  * to prevent). Empty whitespace tokens are DROPPED from the token
  * array (`array_remove`), so an empty/null document is 0 tokens and
  * consecutive whitespace collapses — in BOTH granularities identically
  * ([[chunkByBpe]]'s empty words carry no tokens); token sums in
  * [[chunkStats]] therefore never count phantom tokens.
  *
  * Chunk identity is the (doc_id, chunk_idx) pair plus an md5 content
  * hash, so chunk tables feed [[Dedup.exact]]-style hash dedup and
  * [[InvertedIndex.build]] / embedding pipelines directly
  * (`idCol = "chunk_uid"`).
  *
  * Scale shape: map-only — one projection, one explode with fan-out
  * tokens/stride per row, no shuffle, no state; the chunk table is the
  * same order of magnitude as the corpus. Fully SQL-replayable
  * (generate_series + list_slice; the BPE form replays the merge table),
  * so the gates are FULL oracles.
  */
object Chunker {

  /** The shared window geometry over a (doc_id, __toks) relation:
    * explode chunk indices, slice the window, render its text.
    */
  private def windows(withToks: DataFrame, size: Int, stride: Int,
      render: Column => Column): DataFrame = {
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    val nChunks = when(n <= size, lit(1))
      .otherwise(lit(1) + ceil((n - lit(size)).cast("double") / stride)
        .cast("int"))
    val start = col("chunk_idx") * stride
    val piece = slice(col("__toks"), start + 1, lit(size))
    withToks
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat(col("doc_id"), lit("#"), col("chunk_idx")).as("chunk_uid"),
        start.cast("long").as("token_start"),
        org.apache.spark.sql.functions.size(piece).cast("long").as("n_tokens"),
        render(piece).as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  private def checkDials(size: Int, overlap: Int): Unit = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
  }

  /** One row per (doc, window): doc_id, chunk_idx, chunk_uid, token_start,
    * n_tokens, chunk_text, chunk_hash. Token = whitespace token.
    */
  def chunk(docs: DataFrame, size: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    checkDials(size, overlap)
    windows(
      docs.select(col(idCol).cast("long").as("doc_id"),
        array_remove(split(coalesce(col(textCol), lit("")), " "), "")
          .as("__toks")),
      size, size - overlap, p => array_join(p, " "))
  }

  /** [[chunk]] with the budget measured in BPE TOKENS under a trained
    * merge table ([[BpeTrain.train]] / [[BpeTrain.load]]) — chunk `c`
    * covers BPE tokens `[c·stride, c·stride + size)` of the document's
    * token sequence, so `size` is exactly the embedder's token budget.
    * Windows are cut in TOKEN space, so a boundary may fall mid-word —
    * faithful to how a token-budget encoder truncates; the detokenized
    * `chunk_text` (symbols concatenated, `</w>` → trailing space) then
    * carries the partial word. Detokenization is FAITHFUL, not
    * prettified: a chunk ends with a space iff its window ends on a word
    * boundary (distinguishing it from the same characters cut mid-word —
    * they are different token content and must hash differently), and
    * concatenating overlap-0 chunk texts reconstructs the normalized
    * document exactly, terminal word-boundary space included
    * (spec-pinned losslessness).
    *
    * `token_start`/`n_tokens` are in BPE-token units. Tokenization is the
    * one UDF (the merge-table replay is inherently iterative); the merge
    * table rides the task closure — vocabulary-bounded, kilobytes — and
    * everything downstream of the token array is the same codegen window
    * geometry as [[chunk]]. Consecutive whitespace collapses (empty words
    * carry no tokens), matching [[BpeTrain]]'s vocabulary convention.
    */
  def chunkByBpe(docs: DataFrame, size: Int, overlap: Int,
      merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    checkDials(size, overlap)
    val table = merges.toIndexedSeq
    val tok = udf { (text: String) =>
      text.split(" ", -1).toSeq
        .flatMap(w => BpeTrain.applyMerges(w, table))
    }
    windows(
      docs.select(col(idCol).cast("long").as("doc_id"),
        tok(coalesce(col(textCol), lit(""))).as("__toks")),
      size, size - overlap,
      p => replace(array_join(p, ""), lit("</w>"), lit(" ")))
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
