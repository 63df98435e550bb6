package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Retrieval quality evaluation — the harness that closes the ANN loop: an
  * approximate index (IVF/PQ/SRP, [[SimilaritySearch]]) is only as good as
  * its measured recall against exact ground truth, so the measurement is an
  * operator, not a script. Metrics are the standard eval set that stays
  * EXACT in rational/IEEE arithmetic (recall@k, MRR, hit@k) — no
  * log-discounted nDCG, whose libm `log` is not bit-stable across engines.
  *
  * Both inputs are rank relations `(query_id, neighbor_id, rn)` — the shape
  * every [[SimilaritySearch]] top-k emits. Scale: one equi-join on
  * `(query_id, neighbor_id)` and one groupBy on `query_id`; the query set is
  * the small side by construction (queries ≪ corpus), so metric cost never
  * grows with corpus size — only with result-list size k × queries.
  */
object RetrievalEval {

  /** Per-query metrics of `results` against the exact top-k `truth`:
    * `n_hits` (relevant retrieved), `first_hit_rank` (null when no hit),
    * `recall_at_k`, `reciprocal_rank` (0.0 when no hit). Queries present in
    * `truth` but absent from `results` score zero — silently dropping
    * unanswered queries would inflate every mean.
    */
  def perQuery(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rel = truth.filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val res = results.filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rn"))
    val hitAgg = res.join(rel, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_hits"),
        min(col("rn")).cast("long").as("first_hit_rank"))
    truth.select(col("query_id")).distinct()
      .join(hitAgg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_hit_rank"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall_at_k"),
        when(col("first_hit_rank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_hit_rank").cast("double"))
          .as("reciprocal_rank"))
  }

  /** Discount weights 1/log₂(r+1) for ranks 1..k and their prefix sums —
    * computed ONCE in the JVM and embedded as shortest-roundtrip literals
    * everywhere they are used (including oracle SQL): libm log is not
    * bit-stable across engines, but a literal parsed back IS the same
    * double, so the log-discounted metric becomes exactly replayable (the
    * Poisson-bootstrap identical-literals recipe).
    */
  def ndcgWeights(k: Int): Seq[(Int, BigDecimal, BigDecimal)] = {
    // quantize each libm-computed weight to an EXACT 15-digit decimal
    // rational; all downstream sums are then pure decimal arithmetic with
    // no double→decimal cast whose tie-rounding could differ cross-engine
    val w = (1 to k).map(r => BigDecimal(
      1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(15, BigDecimal.RoundingMode.HALF_UP))
    val cum = w.scanLeft(BigDecimal(0))(_ + _).tail
    (1 to k).map(r => (r, w(r - 1), cum(r - 1)))
  }

  /** Per-query binary-relevance nDCG@k: DCG over the hit ranks with the
    * literal discount table, ideal DCG from the truth-list size's prefix
    * sum. Output `(query_id, n_rel, dcg, ndcg)`.
    */
  def ndcgPerQuery(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = results.sparkSession
    import spark.implicits._
    val wDf = ndcgWeights(k).map(t => (t._1, t._2)).toDF("rn", "wt")
    val cumDf = ndcgWeights(k).map(t => (t._1, t._3)).toDF("nr", "cw")
    val rel = truth.filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val dcg = results.filter(col("rn") <= k)
      .join(rel, Seq("query_id", "neighbor_id"))
      .join(broadcast(wDf), Seq("rn"))
      .groupBy(col("query_id"))
      .agg(sum(col("wt")).cast(DoubleType).as("dcg")) // exact decimal sum
    truth.filter(col("rn") <= k).groupBy(col("query_id"))
      .agg(count(lit(1)).cast("int").as("n_rel"))
      .join(broadcast(cumDf), col("n_rel") === col("nr"))
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel").cast("long").as("n_rel"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        (coalesce(col("dcg"), lit(0.0)) / col("cw").cast(DoubleType))
          .as("ndcg"))
  }

  /** Macro-averaged summary of a [[perQuery]] relation: query count, mean
    * recall@k, MRR, and hit rate. Double means go through an exact DECIMAL
    * sum (the engine-wide Exact.dsum convention) so the averages are
    * order-insensitive and cross-engine bit-stable.
    */
  def summarize(perQuery: DataFrame): DataFrame = {
    def dmean(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(27, 18))).cast(DoubleType) / count(lit(1))
    perQuery.agg(
      count(lit(1)).cast("long").as("n_queries"),
      dmean(col("recall_at_k")).as("mean_recall"),
      dmean(col("reciprocal_rank")).as("mrr"),
      dmean(when(col("n_hits") > 0, lit(1.0)).otherwise(lit(0.0)))
        .as("hit_rate"))
  }
}
