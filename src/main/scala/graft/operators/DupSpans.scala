package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicate-SPAN detection and removal — the substring-level dedup of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"), re-expressed relationally: any k-token window whose text occurs
  * more than once in the corpus marks duplicated text, every occurrence
  * except the globally first (smallest `(doc_id, pos)`) is *redundant*, and
  * per document the redundant windows merge into maximal duplicated spans
  * which [[scrub]] removes. Document-level dedup (exact/MinHash/SimHash in
  * [[Dedup]]) misses this entirely: a boilerplate paragraph quoted inside a
  * thousand otherwise-distinct pages survives whole-document hashing but is
  * exactly what substring dedup exists to strip.
  *
  * The published implementation builds a corpus suffix array — inherently
  * sequential and memory-resident. The distributed shape here is windowed:
  * a duplicated substring of length ≥ k tokens is equivalently a run of
  * duplicated k-grams, so the operator is one corpus-linear window explode,
  * one aggregation keyed by gram, and a per-document interval merge. No
  * stage is quadratic and no state outgrows a partition:
  *
  *  - **Hash prefilter** (the 100 TB move): the first aggregation shuffles
  *    only `(xxhash64(gram), count)` — 8-byte keys — and keeps hash buckets
  *    with ≥ 2 occurrences. On a mostly-unique corpus this discards the
  *    overwhelming majority of windows before any gram STRING (k tokens,
  *    hundreds of bytes at the published k=50) ever ships. The prefilter is
  *    provably lossless: equal grams always share a hash, so dup-hash
  *    buckets are a superset of dup grams — which is why the exact pass
  *    (and the DuckDB oracle) never needs to replay xxhash64.
  *  - **Exact confirm**: survivors group by the gram string itself; the
  *    globally-first occurrence per gram is a `min(struct(doc_id, pos))`
  *    aggregate (no window over the corpus), joined back on the gram.
  *  - **Interval merge**: gaps-and-islands per `doc_id` — per-key windows
  *    bounded by document length, never a single-partition sort.
  *
  * Reference analog: none (the reference dedups nothing); engine-added per
  * the training-data-pipeline mandate, alongside [[Dedup]]/[[Cdc]].
  */
object DupSpans {

  /** Every k-token window occurrence: `(doc_id, pos, gram)` with `pos` the
    * 0-based start token index. Map-only explode; the split is let-bound as
    * an attribute before the window lambda references it (the round-7
    * lambda-CSE rule — see [[Dedup.shingles]]).
    */
  def windowOccurrences(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"window length must be >= 2 tokens, got $k")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(
          when(size(col("toks")) >= k,
            transform(sequence(lit(0), size(col("toks")) - k),
              i => concat_ws(" ", slice(col("toks"), i + 1, lit(k)))))
            .otherwise(array())))
      .toDF("doc_id", "pos", "gram")
  }

  /** Occurrences of duplicated grams minus the globally first copy of each:
    * the positions whose text exists earlier elsewhere. Input must be a
    * [[windowOccurrences]]-shaped relation.
    */
  def redundantOccurrences(occ: DataFrame): DataFrame = {
    val hashed = occ.withColumn("gh", xxhash64(col("gram")))
    val dupHash = hashed.groupBy(col("gh"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("gh"))
    // a gram with one occurrence that merely shares a hash bucket is its own
    // first => filtered by the struct inequality, so collisions cannot leak
    val cand = hashed.join(dupHash, Seq("gh"), "leftsemi")
    val firsts = cand.groupBy(col("gram"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    cand.join(firsts, Seq("gram"))
      .filter(struct(col("doc_id"), col("pos")) =!= col("first"))
      .select(col("doc_id"), col("pos"))
  }

  /** Maximal duplicated spans per document: redundant windows merged into
    * `[span_start, span_end)` token intervals (touching or overlapping
    * windows coalesce). Gaps-and-islands on per-doc windows.
    */
  def dupSpans(docs: DataFrame, k: Int): DataFrame =
    mergeSpans(redundantOccurrences(windowOccurrences(docs, k)), k)

  private[graft] def mergeSpans(redundant: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    redundant
      .withColumn("prev_end",
        max(col("pos") + k).over(
          byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        (col("prev_end").isNull || col("pos") > col("prev_end")).cast("int"))
      .withColumn("island", sum(col("new_island")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"))
  }

  /** Spans of corpus text duplicated VERBATIM from `bench`: span-level
    * decontamination. [[Dedup.decontaminateAgainstGrams]] answers "is this
    * document contaminated?" (a boolean per doc); this answers "WHICH
    * tokens" — the published eval-decontamination practice that removes the
    * matching span and keeps the rest of the document instead of dropping
    * it wholesale. A corpus window is contaminated iff its k-gram text
    * occurs anywhere in `bench`; contaminated windows merge per-doc into
    * maximal `[span_start, span_end)` intervals.
    *
    * Scale shape: the bench side is small by construction (benchmarks ≪
    * corpus), so its distinct gram set broadcasts and the corpus-side probe
    * is a map-only semi join — corpus grams never shuffle. Compose with
    * [[scrubWith]] to rewrite the corpus.
    */
  def contaminatedSpans(corpus: DataFrame, bench: DataFrame,
      k: Int): DataFrame = {
    val benchGrams = windowOccurrences(bench, k)
      .select(col("gram")).distinct()
    val hits = windowOccurrences(corpus, k)
      .join(broadcast(benchGrams), Seq("gram"), "leftsemi")
      .select(col("doc_id"), col("pos"))
    mergeSpans(hits, k)
  }

  /** Incremental (batch-vs-corpus) duplicate spans: which spans of NEW
    * documents duplicate the EXISTING corpus or an earlier position within
    * the batch itself — the ingest-time form ([[Dedup.incrementalDedup]]'s
    * asymmetric probe at substring granularity). Corpus text is never
    * re-scrubbed and never shuffles beyond its gram projection; the batch
    * is the small side. Compose with [[scrubWith]] to clean the batch
    * before appending it.
    */
  def incrementalSpans(corpus: DataFrame, batch: DataFrame,
      k: Int): DataFrame = {
    val occB = windowOccurrences(batch, k)
    // batch grams present anywhere in the corpus: hash prefilter first so
    // corpus gram strings ship only for candidate hashes
    val corpusOcc = windowOccurrences(corpus, k)
    val batchHashes = occB.select(xxhash64(col("gram")).as("gh")).distinct()
    val corpusGrams = corpusOcc
      .withColumn("gh", xxhash64(col("gram")))
      .join(batchHashes, Seq("gh"), "leftsemi")
      .select(col("gram")).distinct()
    val vsCorpus = occB.join(corpusGrams, Seq("gram"), "leftsemi")
      .select(col("doc_id"), col("pos"))
    val withinBatch = redundantOccurrences(occB)
    mergeSpans(vsCorpus.unionByName(withinBatch).distinct(), k)
  }

  /** Remove every token covered by a duplicated span, keeping the corpus's
    * first copy of each duplicated substring (its windows are non-redundant
    * by construction). Output: `doc_id, text (scrubbed), n_tokens_before,
    * n_tokens_removed`. The span list per doc is small, so it joins back to
    * the corpus keyed by `doc_id` and the token filter runs ROW-LOCAL via a
    * positional HOF — document text never shuffles token-exploded.
    */
  def scrub(docs: DataFrame, k: Int): DataFrame =
    scrubWith(docs, dupSpans(docs, k))

  /** [[scrub]] against a precomputed (possibly memoized/persisted)
    * [[dupSpans]] relation — the span list is the shareable artifact when
    * several reports consume one detection pass.
    */
  def scrubWith(docs: DataFrame, dupSpanRel: DataFrame): DataFrame = {
    val spans = dupSpanRel
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("spans"))
    docs
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // null text = zero tokens (not a null-poisoned count); an EMPTY
        // string keeps split's [""] per the cross-engine len(string_split)
        // convention
        when(col("text").isNull, array().cast("array<string>"))
          .otherwise(split(col("text"), " ")).as("toks"),
        coalesce(col("spans"), array()).as("spans"))
      .select(col("doc_id"),
        filter(col("toks"), (_, i) =>
          !exists(col("spans"),
            sp => sp.getField("s") <= i && i < sp.getField("e"))).as("kept"),
        size(col("toks")).cast("long").as("n_tokens_before"),
        col("spans"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("text"),
        col("n_tokens_before"),
        (col("n_tokens_before") - size(col("kept"))).cast("long")
          .as("n_tokens_removed"))
  }
}
