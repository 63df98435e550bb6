package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
  * score every raw-corpus document by how target-like it is under hashed
  * n-gram bag-of-words language models, then keep the highest-weight docs.
  * The weight is the log-likelihood ratio
  * `Σ_g  ln p_target(g) − ln p_raw(g)` over the document's hashed word
  * bigrams, with add-α smoothing over the `numBuckets` hash buckets.
  *
  * Scale shape — the part that matters at 100 TB:
  *  - the two n-gram models are BUCKET-COUNT VECTORS of fixed size
  *    `numBuckets` (default 2^14), built by one map-side-combinable
  *    aggregation each over target and raw corpora;
  *  - scoring broadcasts those two vectors (2 × 128 KiB of longs, NOT the
  *    corpora) and is then a single map-only pass: per document, tokenize →
  *    hash bigrams → sum the precomputed per-bucket log-ratios. No explode,
  *    no join, no shuffle — a raw-corpus row never leaves its partition.
  *  - a UDF carries the scoring loop: the per-bucket lookup table is a
  *    closure array, which Catalyst cannot express without a 2^14-entry
  *    literal map (measured pathological for codegen) or an explode +
  *    broadcast-join + re-group (a shuffle of corpus × grams rows — the
  *    plan this operator exists to avoid).
  *
  * Hashing mirrors [[Dedup.knuth32]] over a 64-bit FNV-1a of the bigram
  * text — deterministic across runs/partitionings, so weights are a
  * reproducible artifact. ln is float math → the gate entry is rows-only;
  * DsirSpec pins semantics (target-like docs outrank off-target ones,
  * smoothing bounds, determinism).
  */
object Dsir {

  /** 64-bit FNV-1a of a string — stable, dependency-free, cheap. */
  private[graft] def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  private[graft] def bucketOf(w1: String, w2: String, numBuckets: Int): Int =
    (((fnv1a(w1 + " " + w2) % numBuckets) + numBuckets) % numBuckets).toInt

  private[graft] def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)

  /** Per-bucket bigram counts of a corpus as one driver-resident vector —
    * the hashed n-gram "language model". Computed distributed (flatMap to
    * bucket ids, map-side-combinable count agg over ≤ numBuckets keys),
    * then collected: the result is O(numBuckets) regardless of corpus
    * size, which is the whole point of feature hashing.
    */
  def bucketCounts(docs: DataFrame, textCol: String = "text",
      numBuckets: Int = 1 << 14): Array[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nb = numBuckets
    val counts = docs.select(col(textCol).cast("string").as("t"))
      .as[String]
      .flatMap { t =>
        val toks = tokensOf(t)
        (1 until toks.length).iterator.map(i => bucketOf(toks(i - 1), toks(i), nb))
      }
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .collect()
    val out = Array.fill[Long](numBuckets)(0L)
    counts.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Map-only importance scoring of `raw` against precomputed target/raw
    * bucket counts. Adds `dsir_weight` (avg per-gram log-likelihood ratio;
    * the average, not the sum, so long documents are not favored per se)
    * and `n_grams`. Documents with no bigram get weight 0.
    */
  def importanceWeights(raw: DataFrame, targetCounts: Array[Long],
      rawCounts: Array[Long], textCol: String = "text",
      alpha: Double = 1.0): DataFrame = {
    require(targetCounts.length == rawCounts.length,
      "bucket vectors must have the same size")
    val nb = targetCounts.length
    // precompute per-bucket log-ratio once on the driver: ln of smoothed
    // target probability minus ln of smoothed raw probability. Shipped as
    // a real SparkContext broadcast (one copy per executor), not a UDF
    // closure capture (one copy per task binary) — at 2^14 buckets the
    // difference is noise, but callers may raise numBuckets
    val tTot = targetCounts.sum.toDouble + alpha * nb
    val rTot = rawCounts.sum.toDouble + alpha * nb
    val logRatio = raw.sparkSession.sparkContext.broadcast(
      Array.tabulate(nb) { b =>
        math.log((targetCounts(b) + alpha) / tTot) -
          math.log((rawCounts(b) + alpha) / rTot)
      })
    val score = udf { (t: String) =>
      val lr = logRatio.value
      val toks = tokensOf(if (t == null) "" else t)
      var s = 0.0; var n = 0; var i = 1
      while (i < toks.length) {
        s += lr(bucketOf(toks(i - 1), toks(i), nb)); n += 1; i += 1
      }
      (if (n == 0) 0.0 else s / n, n)
    }
    raw.withColumn("__sc", score(col(textCol).cast("string")))
      .withColumn("dsir_weight", col("__sc._1"))
      .withColumn("n_grams", col("__sc._2"))
      .drop("__sc")
  }

  /** End-to-end selection: fit both models, score, keep the global top
    * `keep` raw docs by (weight DESC, id ASC). The top-k is a TakeOrdered
    * (per-partition heads merged on the driver), never a global sort.
    */
  def select(raw: DataFrame, target: DataFrame, keep: Int,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = 1 << 14, alpha: Double = 1.0): DataFrame = {
    val t = bucketCounts(target, textCol, numBuckets)
    val r = bucketCounts(raw, textCol, numBuckets)
    importanceWeights(raw, t, r, textCol, alpha)
      .orderBy(col("dsir_weight").desc, col(idCol))
      .limit(keep)
  }

  /** Common production case: the target IS a predicate over the raw corpus
    * (a labeled domain, a source tag). Then both models come out of ONE
    * scan — rows emit (bucket, isTarget) and a single agg yields raw and
    * target counts per bucket — instead of two separate fit passes.
    * Identical counts to the two-pass form (DsirSpec pins it).
    */
  def selectWhere(raw: DataFrame, targetPredicate: Column, keep: Int,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = 1 << 14, alpha: Double = 1.0): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val nb = numBuckets
    val counts = raw
      .select(col(textCol).cast("string").as("t"), targetPredicate.as("tgt"))
      .as[(String, Boolean)]
      .flatMap { case (t, tgt) =>
        val toks = tokensOf(t)
        (1 until toks.length).iterator
          .map(i => (bucketOf(toks(i - 1), toks(i), nb), tgt))
      }
      .groupBy(col("_1").as("bucket"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("_2"), 1L).otherwise(0L)).as("n_target"))
      .collect()
    val tCounts = Array.fill[Long](nb)(0L)
    val rCounts = Array.fill[Long](nb)(0L)
    counts.foreach { row =>
      rCounts(row.getInt(0)) = row.getLong(1)
      tCounts(row.getInt(0)) = row.getLong(2)
    }
    importanceWeights(raw, tCounts, rCounts, textCol, alpha)
      .orderBy(col("dsir_weight").desc, col(idCol))
      .limit(keep)
  }
}
