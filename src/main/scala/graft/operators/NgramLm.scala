package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the published CCNet-style
  * filter: fit n-gram statistics on a high-quality reference corpus, score
  * every candidate document by its smoothed log-likelihood under that
  * model, and gate on the score (low likelihood = far from the reference
  * register). Complements the rule packs (Gopher/C4) and DSIR (which
  * scores *importance* against hashed bucket profiles; this scores
  * *fluency* against exact n-gram counts).
  *
  * Model: add-one-smoothed bigram conditional,
  * p(w2|w1) = (c12 + 1) / (c1 + V). The per-term score is the INTEGER
  * surrogate `floor(ln(c12+1)·1e6) − floor(ln(c1+V)·1e6)` — each ln takes
  * a small-integer argument, quantized separately, so the per-document sum
  * is exact integer arithmetic: order-free, overflow-safe (|term| ≤ ~3e7,
  * docs ≤ ~1e6 terms), and bit-identical cross-engine (measured boundary
  * distance of ln(k)·1e6 to integers ≥ 7e-4 over every observed argument
  * at both SFs vs ~1e-9-quanta worst-case JVM/libm ln skew) — hence the
  * FULL DuckDB oracle on the gate query.
  *
  * Scale shape: the model is vocab-bounded (V unigrams, observed bigrams)
  * and BROADCASTS into the scoring joins; scoring is a map-only explode of
  * each document's bigrams with a map-side-combinable per-doc sum — the
  * corpus never shuffles beyond the per-doc aggregation. A model too big
  * to broadcast shuffles on the bigram key instead (plain equi-join) —
  * same plan the token-rarity query uses.
  */
object NgramLm {

  final case class BigramModel(
      bigrams: DataFrame,   // (w1, w2, c12), persisted
      unigrams: DataFrame,  // (w1, c1), persisted
      vocabSize: Long) {
    def unpersist(): Unit = { bigrams.unpersist(); unigrams.unpersist(); () }
  }

  /** (w1, w2) adjacent-word pairs of `textCol` as an exploded relation. */
  private def bigramPairs(df: DataFrame, idCol: String, textCol: String) = {
    val words = split(col(textCol), " ")
    val n1 = greatest(size(words) - 1, lit(0))
    df.select(col(idCol),
        explode(arrays_zip(slice(words, lit(1), n1), slice(words, lit(2), n1))).as("p"))
      .select(col(idCol), col("p.0").as("w1"), col("p.1").as("w2"))
  }

  /** Fit the reference model: exact bigram + unigram counts and |vocab|.
    * Both count relations persist eagerly — the model is a computed-once
    * artifact (vocabSize already forces one action; without the persist,
    * each scoring broadcast would re-scan the reference corpus). Callers
    * release with [[BigramModel.unpersist]]; repeated consumers memoize
    * per (session, dir) like the other build-once artifacts.
    */
  def fit(ref: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): BigramModel = {
    val toks = ref.select(explode(split(col(textCol), " ")).as("w1"))
    val unigrams = toks.groupBy(col("w1")).agg(count(lit(1)).as("c1")).persist()
    val bigrams = bigramPairs(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")).persist()
    bigrams.count() // materialize both while the scan is hot
    BigramModel(bigrams, unigrams, unigrams.count())
  }

  /** Persist a fitted model as parquet artifacts under `dir` — the text
    * twin of the IVF index persistence: fit on the reference corpus once
    * (the expensive double scan), then every scoring job loads the
    * vocab-bounded count relations instead of re-fitting. `vocab/` is a
    * one-row table so the load needs no extra action over the counts.
    */
  def save(model: BigramModel, dir: String): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
    model.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
    val spark = model.bigrams.sparkSession
    import spark.implicits._
    Seq(model.vocabSize).toDF("vocab_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Load a persisted model; scoring against it is row-for-row identical
    * to scoring against the in-session fit (spec-pinned: exact integer
    * counts survive parquet bit-for-bit).
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String,
      persist: Boolean = true): BigramModel = {
    val big = spark.read.parquet(s"$dir/bigrams")
    val uni = spark.read.parquet(s"$dir/unigrams")
    val v = spark.read.parquet(s"$dir/vocab").collect()(0).getLong(0)
    BigramModel(
      if (persist) big.persist() else big,
      if (persist) uni.persist() else uni, v)
  }

  /** Score every document: (idCol, n_bigrams, lm_q) where lm_q is the
    * exact-integer quantized log-likelihood sum (higher = closer to the
    * reference). Documents with < 2 words score (0, 0).
    */
  def score(docs: DataFrame, model: BigramModel, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lnq: Column => Column = c => floor(log(c.cast("double")) * lit(1000000.0)).cast("long")
    val terms = bigramPairs(docs, idCol, textCol)
      .join(broadcast(model.bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(model.unigrams), Seq("w1"), "left")
      .select(col(idCol),
        (lnq(coalesce(col("c12"), lit(0L)) + 1L) -
          lnq(coalesce(col("c1"), lit(0L)) + lit(model.vocabSize))).as("__lnq"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lnq")).as("lm_q"))
    docs.select(col(idCol))
      .join(terms, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_q"), lit(0L)).as("lm_q"))
  }
}
