package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic bag-of-words text featurizer — the hashing-trick
  * embedder (Weinberger et al. 2009) with the hash replaced by a frozen
  * VOCABULARY RANK, so the same text embeds to the same vector in ANY
  * engine that can sort strings: `v[j] = |{ tokens t : rank(t) mod dim
  * = j }|`. Counts are exact integers carried in doubles (every sum <
  * 2^53 is order-free IEEE-exact), which is what lets the composed RAG
  * gate (`tx_rag_pipeline`) replay dense cosine retrieval bit-for-bit
  * in DuckDB — the replayable stand-in at the same contract boundary as
  * [[graft.sources.StubEmbedder]] (swap in a model-backed
  * [[graft.sources.Embedder]] for production semantics; the pipeline
  * around it is unchanged).
  *
  * Scale shape: the vocabulary is a build-once bounded artifact (terms
  * ≪ corpus, the [[InvertedIndex]] termDf argument) ranked by the
  * two-pass [[GlobalRank.withGlobalRankOrdered]] (no single-partition
  * string sort), then BROADCAST to the embed pass; embedding is one
  * map-side explode + two keyed aggregations — no shuffle wider than
  * (id, bucket). Empty tokens are dropped (the [[Chunker]] convention:
  * no phantom tokens), so a text with no tokens yields NO vector — a
  * retrieval corpus cannot rank a contentless chunk.
  */
object BowEmbed {

  /** Frozen vocabulary: one row per distinct non-empty whitespace token
    * with its dense 1-based alphabetical rank — `(term, rank)`.
    */
  def vocabRanks(texts: DataFrame, textCol: String): DataFrame = {
    val terms = texts
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val (ranked, _) = GlobalRank.withGlobalRankOrdered(terms, "rank",
      col("term"))
    ranked.select(col("term"), col("rank"))
  }

  /** ROW-LOCAL linear score under a frozen per-term weight table: the
    * left fold `Σ_tokens w(token)` over the text's non-empty whitespace
    * tokens (unknown tokens contribute 0) as a pure Column expression —
    * no shuffle, no state, STREAM-safe (the serving form of a trained
    * linear text classifier: score at ingest). The fold order is the
    * token order, so the result is bit-deterministic and exactly
    * replayable by any engine folding the same weights left-to-right
    * (`tx_stream_quality_flags`). The map is a PLAN LITERAL probed by
    * `element_at` — a linear scan per token over Catalyst's map data —
    * so this form is for VOCABULARY-BOUNDED weight tables (hashed-
    * bucket models, bounded corpora); open vocabularies should
    * broadcast-join the weight relation instead (the [[embed]] plan).
    */
  def scoreColumn(weightsByTerm: Map[String, Double],
      textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m = typedlit(weightsByTerm)
    aggregate(
      filter(split(textCol, " "), t => length(t) > 0),
      lit(0.0),
      (acc, t) => acc + coalesce(element_at(m, t), lit(0.0)))
  }

  /** Embed each row's text under the frozen vocabulary: `(idCol,
    * embedding ARRAY<DOUBLE>[dim])` with `embedding[j]` = count of
    * tokens whose `(rank − 1) mod dim = j`. Rows with zero non-empty
    * tokens are absent from the output.
    */
  def embed(texts: DataFrame, vocab: DataFrame, dim: Int,
      idCol: String, textCol: String): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val buckets = vocab.select(col("term"),
      pmod(col("rank") - 1, lit(dim.toLong)).cast("int").as("bucket"))
    texts
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .join(broadcast(buckets), Seq("term"))
      .groupBy(col("__id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("__id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt"))))
        .as("__m"))
      .select(col("__id").as(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          j => coalesce(element_at(col("__m"), j.cast("int")), lit(0L))
            .cast("double")).as("embedding"))
  }
}
