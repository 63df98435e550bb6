package graft.queries

import graft.Tables
import graft.functions.VecOps
import graft.ml.MlOps
import graft.operators.{Dedup, SimilaritySearch, VecAgg}
import org.apache.spark.sql.functions._

/** Engine-native operators with no exact ANSI-SQL twin (hash-seeded LSH,
  * MLlib estimators, fused array kernels). Registered as `queries` WITHOUT
  * `oracleSql`, so the driver applies its rows-only check; each has a
  * ScalaTest spec asserting semantics (agreement with the long-form oracle
  * queries, golden values, or ML properties) instead.
  *
  * These are the plans meant for the 100 TB path: array-native kernels keep
  * vector math inside whole-stage codegen (no posexplode row blow-up), the
  * typed aggregators are map-side combinable, and LSH replaces quadratic
  * candidate generation with bucket equi-joins.
  */
object EngineQueries extends QueryPack {

  // fused flagship: per-label centroids via O(D)-buffer aggregator, then
  // pairwise cosine — the scale-path twin of v_centroid_cosine_matrix
  private val fastCentroidCosine = OracleQuery(
    "vx_fast_centroid_cosine",
    (s, d) => {
      val cents = Tables.embeddings(s, d)
        .groupBy(col("label"))
        .agg(VecAgg.meanVec(col("embedding")).as("centroid"))
      cents.as("a").select(col("label").as("l1"), col("centroid").as("ca"))
        .crossJoin(cents.as("b").select(col("label").as("l2"), col("centroid").as("cb")))
        .filter(col("l1") <= col("l2"))
        .select(col("l1"), col("l2"), VecOps.cosineNative(col("ca"), col("cb")).as("cosine"))
        .orderBy(col("l1"), col("l2"))
    },
    None)

  // CKA similarity between the two halves of the embedding space, per label
  // (A5/J5 aggregate in its native fused form)
  private val ckaPerLabel = OracleQuery(
    "vx_cka_half_spaces",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"),
          slice(col("embedding"), 1, 32).as("x"),
          slice(col("embedding"), 33, 32).as("y"))
        .groupBy(col("label"))
        .agg(VecAgg.cka(col("x"), col("y")).as("cka"))
        .orderBy(col("label")),
    None)

  // J5 complete: group×group CKA matrix — the reference's pairwise heatmap
  // (src/compare_xception_featuremaps.py:139-160). Rows are aligned across
  // groups by deterministic per-group rank (the reference's equal-n seeded
  // sample, L2), pairs joined on that rank; symmetric half computed once
  // (l1 <= l2), diagonal = 1 by CKA(X,X). One shuffle for the rank window,
  // one for the pair join — no n×n Gram ever materializes (O(d²) buffers).
  private val ckaGroupMatrix = OracleQuery(
    "vx_cka_group_matrix",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label"))
        .orderBy(xxhash64(col("vec_id"), lit(42L)), col("vec_id"))
      val ranked = Tables.embeddings(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 100)
        .select(col("label"), col("rn"), col("embedding"))
      ranked.as("a").join(ranked.as("b"),
          col("a.rn") === col("b.rn") && col("a.label") <= col("b.label"))
        .groupBy(col("a.label").as("l1"), col("b.label").as("l2"))
        .agg(VecAgg.cka(col("a.embedding"), col("b.embedding")).as("cka"))
        .orderBy(col("l1"), col("l2"))
    },
    None)

  // HLL distinct (engine-added; SURVEY.md §2.4 note): sketch-based distinct
  // counts for the 100 TB path where exact distinct would shuffle every key.
  // Spec-checked against exact counts within HLL error; no cross-engine
  // oracle (sketch internals differ)
  private val hllDistinct = OracleQuery(
    "agg_hll_distinct",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supps"))
        .orderBy(col("l_returnflag")),
    None)

  // brute-force exact ANN (small query set broadcast against the corpus)
  private val annBrute = OracleQuery(
    "vx_ann_brute_top5",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    None)

  // LSH-bucketed approximate ANN (the sub-linear scale path)
  private val annLsh = OracleQuery(
    "vx_ann_lsh_top5",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    None)

  // the native codegen expression driven through the verify gate: pairwise
  // vector cosine via the registry-free Column form (works in ANY session,
  // extension-registered or not) — rows-only check; exact agreement with
  // the HOF form is spec-asserted (ExpressionSpec)
  private val nativeCosine = OracleQuery(
    "vx_native_cosine_pairs",
    (s, d) => {
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 30)
      emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
        .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
        .filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          graft.functions.VecOps.cosineNative(col("a"), col("b")).as("cosine"))
        .orderBy(col("ia"), col("ib"))
    },
    None)

  // IVF-partitioned approximate ANN (k-means inverted file + nprobe probing)
  private val annIvf = OracleQuery(
    "vx_ann_ivf_top5",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        nlist = 8, nprobe = 4)
    },
    None)

  // MinHash-LSH near-dup detection over documents (north-star dedup)
  private val dedupMinhash = OracleQuery(
    "tx_dedup_minhash_pairs",
    (s, d) => Dedup.minhashNearDups(Tables.documents(s, d), threshold = 0.5),
    None)

  // SimHash near-dup detection
  private val dedupSimhash = OracleQuery(
    "tx_dedup_simhash_pairs",
    (s, d) => Dedup.simhashNearDups(Tables.documents(s, d), maxHamming = 3),
    None)

  // full dedup pipeline: minhash candidate pairs → connected components →
  // canonical keep/drop decisions (the operational output of dedup)
  private val dedupCanonical = OracleQuery(
    "tx_dedup_canonical",
    (s, d) => {
      val pairs = Dedup.minhashNearDups(Tables.documents(s, d), threshold = 0.5)
      Dedup.canonicalize(pairs).orderBy(col("doc_id"))
    },
    None)

  // PCA projection of the embedding space to 2-D (M5) with label carried
  private val pca2d = OracleQuery(
    "mx_pca_2d",
    (s, d) => {
      val (projected, _) = MlOps.pca(Tables.embeddings(s, d), "embedding", k = 2)
      projected.select(col("vec_id"), col("label"),
        element_at(col("pc"), 1).as("pc1"), element_at(col("pc"), 2).as("pc2"))
        .orderBy(col("vec_id"))
    },
    None)

  // label-separability score (M8): logreg CV accuracy as a 1-row relation
  private val separability = OracleQuery(
    "mx_separability_logreg",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("y", (col("label") % 2).cast("double"))
      val acc = MlOps.logregCvAccuracy(emb, "embedding", "y", "vec_id", k = 3)
      val spark = s
      import spark.implicits._
      Seq(("logreg_cv3", acc)).toDF("model", "accuracy")
    },
    None)

  override val all: Seq[OracleQuery] = Seq(
    fastCentroidCosine, ckaPerLabel, ckaGroupMatrix, hllDistinct,
    nativeCosine, annBrute, annLsh, annIvf,
    dedupMinhash, dedupSimhash, dedupCanonical, pca2d, separability)
}
