package graft.pipelines

import graft.operators.TensorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explainability post-processing (SURVEY.md §7.2 step 7): everything the
  * reference does AFTER gradient/attention capture, as engine dataflow.
  * Capture itself (hooks, autograd) happens inside the model black box and
  * lands as tables; these pipelines take those tables to heatmaps.
  */
object Explainability {

  /** Grad-CAM (src/gradcam_dynamic.py:132-207 post-capture): feature maps
    * (FeatureMapStore schema) joined with captured per-channel mean-gradient
    * weights (image_stem, layer, weights ARRAY<DOUBLE>) →
    * relu(Σ_c w_c·A_c) → min-max normalize → bilinear upsample to
    * (outH, outW). One row per (image, layer) with `cam ARRAY<DOUBLE>`
    * length outH·outW.
    */
  def gradCam(fmaps: DataFrame, gradWeights: DataFrame,
      outH: Int = 224, outW: Int = 224): DataFrame = {
    val joined = fmaps.join(gradWeights, Seq("image_stem", "layer"))
    val cam = joined.withColumn("raw_cam",
      TensorOps.camWeightedSum(col("fmap"), col("weights"),
        col("c"), col("h"), col("w")))
    cam
      .withColumn("norm_cam", TensorOps.minMaxNormalize(col("raw_cam")))
      .withColumn("cam",
        TensorOps.bilinearUpsample(col("norm_cam"), col("h"), col("w"), outH, outW))
      .select(col("arch"), col("group"), col("image_stem"), col("layer"),
        col("cam"))
  }

  /** The reference's `save_original` step (src/feature_map_analysis.py:68-75):
    * recover the displayable input from a normalized [3,H,W] tensor —
    * per-channel x·std + mean (ImageNet constants by default), clamp to
    * [0,1], then the uint8 pixel scale `(x·255).astype(uint8)` (truncating,
    * values already ≥ 0). Completes the Grad-CAM post-chain: this is the
    * image the CAM heatmap overlays.
    */
  def originalImage(imgs: DataFrame, imgCol: String = "img",
      means: Seq[Double] = Seq(0.485, 0.456, 0.406),
      stds: Seq[Double] = Seq(0.229, 0.224, 0.225)): DataFrame = {
    val meanArr = array(means.map(lit): _*)
    val stdArr = array(stds.map(lit): _*)
    imgs
      .withColumn("__denorm", TensorOps.denormalize(
        col(imgCol), meanArr, stdArr, lit(means.length), col("h"), col("w")))
      .withColumn("pixels",
        transform(col("__denorm"), v => floor(v * lit(255.0)).cast("int")))
      .drop("__denorm")
  }

  /** Attention rollout to a patch-grid heatmap (src/gradcam_dynamic.py:212-316
    * post-capture): long-form attention table → rollout CLS row → drop CLS
    * column, reshape to grid, min-max normalize, upsample. `gridSide` is the
    * patch grid dimension (e.g. 14 for ViT-B/16 at 224px).
    */
  def attentionHeatmap(attn: DataFrame, numLayers: Int, gridSide: Int,
      outH: Int = 224, outW: Int = 224): DataFrame = {
    val cls = TensorOps.attentionRollout(attn, numLayers)
      .filter(col("j") >= 1) // drop attention-to-CLS itself
      .withColumn("patch", col("j") - 1)
      .filter(col("patch") < gridSide * gridSide)
    val grids = cls.groupBy(col("image_key"))
      .agg(map_from_arrays(collect_list(col("patch")), collect_list(col("weight")))
        .as("by_patch"))
      .select(col("image_key"),
        transform(sequence(lit(0), lit(gridSide * gridSide - 1)),
          p => coalesce(element_at(col("by_patch"), p), lit(0.0))).as("grid"))
    grids
      .withColumn("norm_grid", TensorOps.minMaxNormalize(col("grid")))
      .withColumn("heatmap", TensorOps.bilinearUpsample(
        col("norm_grid"), lit(gridSide), lit(gridSide), outH, outW))
      .select(col("image_key"), col("heatmap"))
  }
}
