package graft.pipelines

import graft.ml.{MlOps, Reduce2d}
import graft.operators.VecAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's top-level analysis flows as composable library calls —
  * what a user of Liranitz/BigData-DeepfakeAnalysis runs today, re-expressed
  * over any (group, id, vector) table.
  *
  * Flow 1 (`embeddingMap`) = analyze_embedding_with_tsne.py --mode combined
  * (SURVEY.md §3.2): per-group seeded sample cap → guard n≥3 → 2-D reduction
  * → coordinates + per-group counts.
  *
  * Flow 2 (`compareSpaces`) = compare_embeddings_vs_features.py (SURVEY.md
  * §3.3): restrict to common groups → equal-n aligned sample → per-space
  * separability scores + cross-space CKA.
  */
object DeepfakeAnalysis {

  final case class EmbeddingMap(coords: DataFrame, groupCounts: DataFrame)

  def embeddingMap(
      emb: DataFrame, vecCol: String, idCol: String, groupCol: String,
      method: String = "pca", samplePerGroup: Int = 500,
      seed: Long = 42L): EmbeddingMap = {
    // P7: drop groups with < 3 samples (reference guard)
    val bigEnough = emb
      .join(broadcast(
        emb.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
          .filter(col("__n") >= 3).select(col(groupCol))),
        Seq(groupCol))
    val coords = Reduce2d(bigEnough, vecCol, idCol, groupCol,
      method = method, maxPerGroup = samplePerGroup, seed = seed)
    val counts = coords.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .orderBy(col("label"))
    EmbeddingMap(coords, counts)
  }

  final case class SpaceComparison(
      alignedCounts: DataFrame,
      ckaPerGroup: DataFrame,
      separabilityA: Double,
      separabilityB: Double)

  /** Both inputs: (groupCol, idCol, vecCol) with ids comparable across
    * spaces (the reference joins on image stem, J2).
    */
  def compareSpaces(
      a: DataFrame, b: DataFrame, vecCol: String, idCol: String,
      groupCol: String, maxPerGroup: Int = 500, seed: Long = 42L,
      cvFolds: Int = 3): SpaceComparison = {

    // J1: common groups; J2: row-level join on (group, id)
    val joined = a.select(col(groupCol), col(idCol), col(vecCol).as("__va"))
      .join(b.select(col(groupCol), col(idCol), col(vecCol).as("__vb")),
        Seq(groupCol, idCol))

    // L2: equal-n per group via deterministic hash-order cap
    val w = Window.partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    val aligned = joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
      .cache()

    val counts = aligned.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .orderBy(col(groupCol))

    // A5: cross-space CKA per group (how similarly do the two spaces
    // arrange the same images?)
    val cka = aligned.groupBy(col(groupCol))
      .agg(VecAgg.cka(col("__va"), col("__vb")).as("cka"))
      .orderBy(col(groupCol))

    // M7+M8: group separability in each space
    val indexed = MlOps.indexLabels(aligned, groupCol, "label_idx")
    val accA = MlOps.logregCvAccuracy(indexed, "__va", "label_idx", idCol, cvFolds)
    val accB = MlOps.logregCvAccuracy(indexed, "__vb", "label_idx", idCol, cvFolds)
    aligned.unpersist()
    SpaceComparison(counts, cka, accA, accB)
  }
}
