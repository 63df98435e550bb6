package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (north-star
  * op; SURVEY.md §2.8 engine-added). Two paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k via query×corpus join. The join is
  *    a broadcast of the (small) query set against the corpus — no shuffle of
  *    the corpus at all; per-row math is a codegen'd higher-order-function
  *    dot product (VecOps). Right at any corpus size as long as the QUERY
  *    side is small; cost is |Q|·|corpus| dot products, embarrassingly
  *    parallel over corpus partitions.
  *
  *  - `lshTopK`: random-hyperplane LSH (signed projections) bucket join.
  *    Corpus and queries hash to `numTables` independent signature buckets;
  *    candidates are bucket collisions only, then exact re-rank. Sub-linear
  *    candidate counts at the cost of recall; recall rises with tables.
  *    Hyperplanes are derived deterministically from (table, dim, seed) via
  *    a hash → uniform in [-1,1], so executors regenerate them without any
  *    driver-side randomness or broadcast payload.
  */
object SimilaritySearch {

  /** Exact cosine top-k of `queries` against `corpus`; both need (idCol,
    * vecCol). Returns (query_id, rn, neighbor_id, cosine).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val t = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("tv"))
    val scored = t.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VecOps.cosine(col("qv"), col("tv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, dim):
    * xxhash64 → [-1, 1]. Same expression on both sides of the join, so the
    * signatures agree without sharing state.
    */
  private def plane(table: Int, dim: Column, seed: Long) =
    (pmod(xxhash64(lit(table), dim, lit(seed)), lit(2000001L)) - lit(1000000L))
      .cast("double") / lit(1000000.0)

  /** Signed-random-projection signature for one table: bit j = sign of
    * Σ_d v[d]·plane(table·B+j, d). `bitsPerTable` bits packed into a long.
    */
  private def signature(vec: Column, table: Int, bitsPerTable: Int, seed: Long) = {
    val bits = (0 until bitsPerTable).map { j =>
      val proj = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            d => plane(table * bitsPerTable + j, d, seed)),
          (v, p) => v.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate cosine top-k. Each side gets `numTables`
    * signatures; candidate pairs share (table, signature); exact cosine
    * re-ranks candidates. Returns (query_id, rn, neighbor_id, cosine).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      numTables: Int = 8, bitsPerTable: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {

    def withBuckets(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(array((0 until numTables).map(t =>
          signature(col(vecCol), t, bitsPerTable, seed)): _*)).as(Seq("table", "sig")))

    val c = withBuckets(corpus, "neighbor_id", "tv")
    val q = withBuckets(queries, "query_id", "qv")
    val candidates = c.join(q, Seq("table", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("tv"))
      .distinct()
    val scored = candidates.select(col("query_id"), col("neighbor_id"),
      VecOps.cosine(col("qv"), col("tv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rn"))
  }
}
