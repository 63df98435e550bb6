package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * embedding space, then prune, within each cluster, every vector that has
  * a more-extreme near-duplicate — "extreme" = farther from the cluster
  * centroid, the paper's keep-the-outlier policy (retaining the
  * low-centroid-similarity member keeps the most diverse representative of
  * each semantic duplicate group).
  *
  * Scale shape: clustering bounds the candidate set the way LSH bands do —
  * pairwise comparison happens only inside a cluster, so the cost is
  * Σ|c_i|² instead of n². The number of clusters is THE scale dial (the
  * paper uses k ≈ √n; here k is a parameter), and [[semDedupKMeans]]
  * shares its clustering artifact with the ANN inverted file
  * ([[SimilaritySearch.buildIvfIndex]]) — one k-means pass serves both
  * retrieval and curation. An overfull-cluster guard (same policy as
  * [[SimilaritySearch.lshNearDupPairs]]'s hot buckets) keeps a degenerate
  * clustering from reintroducing the n² term: clusters above
  * `maxClusterSize` contribute no prune pairs (their members are kept).
  *
  * Determinism: assignment is argmin of exact arithmetic with ties to the
  * lowest cluster id, and the prune priority is (centroid_dist DESC, id
  * ASC) — on quantized integer-valued vectors every comparison is exact, so
  * the whole pass is replayable in ANSI SQL (the `vx_semdedup_quantized`
  * gate query hash-matches DuckDB end-to-end).
  *
  * Reference context: the reference analyzes embedding-space structure by
  * stacking per-model embeddings and running t-SNE over their pairwise
  * affinities on a driver-resident, per-model-sampled matrix
  * (/root/reference/src/analyze_embedding_with_tsne.py:150-173); SemDeDup
  * is the published curation-scale form of acting on that same
  * embedding-proximity structure.
  */
object SemDedup {

  /** Assign each vector to its nearest center (squared L2, ties to the
    * lowest center index). Pure codegen: one `aggregate(zip_with(...))`
    * distance expression per center, argmin via `least` + a first-match
    * `when` chain — no UDF, so the map stays inside whole-stage codegen.
    * Adds `cluster_id` (LONG) and `centroid_dist` (DOUBLE). Element values
    * are cast to double; on integer-valued (quantized) inputs ≤ ~1e6 per
    * element and dim ≤ ~1000 every distance is < 2^53 and therefore exact.
    */
  def assign(
      emb: DataFrame, centers: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centers.nonEmpty, "assign: need at least one center")
    val distCols = centers.zipWithIndex.map { case (c, i) =>
      aggregate(
        zip_with(col(vecCol), typedLit(c),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0d), (acc, x) => acc + x).as(s"__d$i")
    }
    val withD = emb.select(col("*") +: distCols: _*)
    val minD = least(centers.indices.map(i => col(s"__d$i")): _*)
    val cluster = centers.indices.foldRight(lit(-1L)) { (i, rest) =>
      when(col(s"__d$i") === col("__dmin"), lit(i.toLong)).otherwise(rest)
    }
    withD.withColumn("__dmin", minD)
      .withColumn("cluster_id", cluster)
      .withColumnRenamed("__dmin", "centroid_dist")
      .drop(centers.indices.map(i => s"__d$i"): _*)
  }

  /** Prune step: a vector is dropped iff some same-cluster mate has
    * cosine > `tau` with it AND higher keep priority (farther from the
    * centroid; ties broken by lower id). Matches the reference SemDeDup
    * implementation's policy of walking each cluster in centroid-similarity
    * order and dropping any item too close to an earlier one. Candidate
    * pairs come from the cluster equi-join only — never a corpus cross
    * join. Returns the input plus a `keep` BOOLEAN.
    */
  def prune(
      assigned: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxClusterSize: Int = 100000): DataFrame = {
    val slim = assigned.select(
      col(idCol).as("__id"), col(vecCol).as("__v"),
      col("cluster_id").as("__c"), col("centroid_dist").as("__dist"))
    val guarded = slim.join(
      slim.groupBy(col("__c")).agg(count(lit(1)).as("__cs"))
        .filter(col("__cs") <= maxClusterSize).select(col("__c")),
      Seq("__c"))
    val x = guarded
    val y = guarded.select(col("__c").as("__yc"), col("__id").as("__yid"),
      col("__v").as("__yv"), col("__dist").as("__ydist"))
    val pruned = x.join(y,
        col("__c") === col("__yc") && (col("__ydist") > col("__dist") ||
          (col("__ydist") === col("__dist") && col("__yid") < col("__id"))))
      .filter(VecOps.cosineNative(col("__v"), col("__yv")) > tau)
      .select(col("__id")).distinct()
      .withColumn("__pruned", lit(true))
    assigned.join(
        pruned.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .withColumn("keep", coalesce(!col("__pruned"), lit(true)))
      .drop("__pruned")
  }

  /** Full pass with caller-supplied (e.g. seed) centers. */
  def semDedup(
      emb: DataFrame, centers: Seq[Seq[Double]], tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxClusterSize: Int = 100000): DataFrame =
    prune(assign(emb, centers, idCol, vecCol), tau, idCol, vecCol,
      maxClusterSize)

  /** Production form: centers come from the same bounded-sample k-means
    * that builds the ANN inverted file, so curation and retrieval share one
    * clustering artifact. Iterative k-means is engine-specific → verified
    * by spec (SemDedupSpec), gate entry rows-only.
    */
  def semDedupKMeans(
      emb: DataFrame, nlist: Int, tau: Double, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxClusterSize: Int = 100000): DataFrame = {
    val index = SimilaritySearch.buildIvfIndex(
      emb, nlist = nlist, seed = seed, idCol = idCol, vecCol = vecCol,
      persist = false)
    val centers = index.centers.map(_.toSeq).toSeq
    semDedup(
      emb.select(col(idCol), transform(col(vecCol), _.cast("double")).as(vecCol)),
      centers, tau, idCol, vecCol, maxClusterSize)
  }
}
