package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (Rabin-style rolling hash): split each document
  * into variable-length token chunks whose boundaries depend only on LOCAL
  * content — a boundary falls where the rolling hash of the last `window`
  * tokens is 0 mod `modulus` (subject to min/max chunk lengths). The
  * payoff over fixed-size chunks is edit stability: inserting or deleting
  * a token early in a document shifts at most the chunks around the edit,
  * while every chunk whose window doesn't straddle it keeps its exact
  * boundaries and hash (CdcSpec pins this). That property is what makes
  * CHUNK-level dedup work — shared boilerplate and quoted passages dedup
  * across documents that are globally distinct, the granularity between
  * whole-document dedup and exact-substring suffix-array dedup.
  *
  * Scale shape: chunking is a row-local flatMap (map-only, no state, no
  * shuffle); downstream chunk dedup is one groupBy on the chunk hash —
  * identical profile to document-level exact dedup. Expected chunk length
  * is `modulus` tokens (min/max clamp the tail), so chunk-table row count
  * is corpus_tokens / modulus.
  *
  * The rolling hash is a degree-`window` polynomial over per-token FNV-1a
  * values in Long arithmetic (wrapping, deterministic everywhere) — the
  * same JVM-hash-twin discipline as [[Dsir]]; engine-hash boundaries are
  * not SQL-replayable, so the gate entry is rows-only with spec-pinned
  * semantics.
  */
object Cdc {

  private final val B = 1000003L // polynomial base (prime, fits wrap math)

  /** Chunked corpus: one row per (doc, chunk) with the chunk's text span
    * and content hash. Pure flatMap — map-only at any scale.
    */
  def chunkDocuments(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 4, modulus: Int = 16,
      minLen: Int = 8, maxLen: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = if (t == null) Array.empty[String] else t.split(" ").filter(_.nonEmpty)
        spansOf(toks, window, modulus, minLen, maxLen).zipWithIndex.map {
          case ((s0, n), idx) =>
            val text = toks.slice(s0, s0 + n).mkString(" ")
            (id, idx.toLong, s0.toLong, n.toLong, text)
        }
      }
      .toDF(idCol, "chunk_idx", "token_start", "n_tokens", "chunk_text")
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  /** Boundary scan with a true rolling window hash: h_i covers tokens
    * (i-window, i]; subtracting the outgoing token's contribution keeps the
    * update O(1) per token. A boundary is declared after token i when the
    * current chunk has ≥ minLen tokens and (h_i % modulus == 0 or the
    * chunk hit maxLen).
    */
  private[graft] def spansOf(tokens: Array[String], window: Int,
      modulus: Int, minLen: Int, maxLen: Int): Seq[(Int, Int)] = {
    require(window >= 1 && modulus >= 1 && minLen >= 1 && maxLen >= minLen)
    if (tokens.isEmpty) return Seq.empty
    val bPowW: Long = {
      var p = 1L; var i = 0
      while (i < window) { p *= B; i += 1 }; p
    }
    val hv = tokens.map(Dsir.fnv1a)
    val spans = Seq.newBuilder[(Int, Int)]
    var start = 0
    var h = 0L
    var i = 0
    while (i < tokens.length) {
      h = h * B + hv(i)
      if (i >= window) h -= hv(i - window) * bPowW
      val len = i - start + 1
      val boundary = len >= minLen &&
        (java.lang.Math.floorMod(h, modulus.toLong) == 0L || len >= maxLen)
      if (boundary) { spans += ((start, len)); start = i + 1 }
      i += 1
    }
    if (start < tokens.length) spans += ((start, tokens.length - start))
    spans.result()
  }
}
