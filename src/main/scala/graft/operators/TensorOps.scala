package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataflow over the feature-map tensor table (SURVEY.md §1.4 schema:
  * (arch, group, image_stem, layer, c, h, w, fmap ARRAY<FLOAT> row-major
  * C·H·W)) — the engine form of the reference's tensor post-processing:
  * global-average-pool (A1), gradient-weighted CAM (A9), min-max normalize
  * (A6), bilinear upsample (the reference's cv2.resize step), and attention
  * rollout (A10). Model-side capture (hooks, autograd) stays outside the
  * engine per SURVEY.md §2.8 M11/M12; everything AFTER capture is relational.
  *
  * Array-form kernels are one codegen'd pass per row; only rollout's
  * matrix-chain crosses rows (per-layer join, driver-looped over the bounded
  * layer count).
  */
object TensorOps {

  /** A1 (tensor form): [C,H,W] → [C] by mean over each channel's H·W plane.
    * Row-local: slice per channel + aggregate — no explode.
    */
  def globalAveragePool(fmap: Column, c: Column, h: Column, w: Column): Column = {
    val plane = (h * w).cast("int")
    transform(sequence(lit(0), c.cast("int") - 1), ch =>
      aggregate(slice(fmap, ch * plane + 1, plane), lit(0.0),
        (acc, v) => acc + v.cast("double")) / plane.cast("double"))
  }

  /** A9: Grad-CAM style weighted channel sum + ReLU:
    * cam[p] = max(0, Σ_ch weights[ch] · fmap[ch·plane + p]).
    * weights is an ARRAY<DOUBLE> column of length C (the captured mean
    * gradients, src/gradcam_dynamic.py:168-173).
    */
  def camWeightedSum(fmap: Column, weights: Column, c: Column, h: Column, w: Column): Column = {
    val plane = (h * w).cast("int")
    transform(sequence(lit(0), plane - 1), p =>
      greatest(
        aggregate(sequence(lit(0), c.cast("int") - 1), lit(0.0),
          (acc, ch) => acc + element_at(weights, ch + 1) *
            element_at(fmap, ch * plane + p + 1).cast("double")),
        lit(0.0)))
  }

  /** A7 (tensor form): undo per-channel input normalization on a row-major
    * [C,H,W] tensor — x·std_ch + mean_ch, clamped to [0,1]
    * (src/feature_map_analysis.py:68-75: x = x*std + mean; x.clamp(0, 1)).
    * `means`/`stds` are ARRAY<DOUBLE> columns of length C; element e belongs
    * to channel e / (h·w). One codegen'd transform, no explode.
    */
  def denormalize(img: Column, means: Column, stds: Column,
      c: Column, h: Column, w: Column): Column = {
    val plane = (h * w).cast("int")
    transform(img, (v, e) => {
      // Column `/` is double division; truncate back to the channel ordinal
      val ch = (e / plane).cast("int") + 1
      // `c` is the declared channel count: an element whose derived channel
      // exceeds it means the tensor shape and (c,h,w) disagree — surface
      // an explicit null rather than silently clamping a garbage value
      // (element_at past the means/stds length would also null, but only
      // when those arrays happen to be exactly c long)
      when(ch <= c,
        least(greatest(
          v.cast("double") * element_at(stds, ch) + element_at(means, ch),
          lit(0.0)), lit(1.0)))
    })
  }

  /** A6 (array form): min-max normalize with eps guard
    * ((m - min)/(max - min + 1e-8), src/gradcam_dynamic.py:173-175).
    */
  def minMaxNormalize(arr: Column): Column = {
    val mn = array_min(arr).cast("double")
    val mx = array_max(arr).cast("double")
    transform(arr, v => (v.cast("double") - mn) / (mx - mn + lit(1e-8)))
  }

  /** Bilinear upsample of a row-major [h,w] plane to [oh,ow] — the
    * reference's cv2.resize / F.interpolate post-step. Align-corners=false
    * (half-pixel centers), matching the torch default. One UDF pass.
    */
  def bilinearUpsample(plane: Column, h: Column, w: Column, oh: Int, ow: Int): Column = {
    val f = udf { (p: Seq[Double], hIn: Int, wIn: Int) =>
      val out = new Array[Double](oh * ow)
      var oy = 0
      while (oy < oh) {
        val sy = ((oy + 0.5) * hIn / oh - 0.5).max(0).min(hIn - 1)
        val y0 = sy.toInt; val y1 = (y0 + 1).min(hIn - 1); val fy = sy - y0
        var ox = 0
        while (ox < ow) {
          val sx = ((ox + 0.5) * wIn / ow - 0.5).max(0).min(wIn - 1)
          val x0 = sx.toInt; val x1 = (x0 + 1).min(wIn - 1); val fx = sx - x0
          val v = p(y0 * wIn + x0) * (1 - fy) * (1 - fx) +
            p(y0 * wIn + x1) * (1 - fy) * fx +
            p(y1 * wIn + x0) * fy * (1 - fx) +
            p(y1 * wIn + x1) * fy * fx
          out(oy * ow + ox) = v
          ox += 1
        }
        oy += 1
      }
      out
    }
    f(plane, h, w)
  }

  /** A10: ViT attention rollout (src/gradcam_dynamic.py:286-305) over a
    * long-form attention table (image_key, layer, i, j, a) where `a` is the
    * head-averaged attention. Per layer: A' = rownorm(A + I); rollout =
    * A'_L · … · A'_1; returns the CLS row (i = 0) per image as
    * (image_key, j, weight).
    *
    * The chain is a driver loop over the (bounded, ~12) layer count; each
    * step is one distributed matmul: groupBy(image, i, k) sum(a·b) — the
    * natural relational form, partitioned by image so every matmul is local
    * to its image's partition after the first shuffle.
    */
  def attentionRollout(attn: DataFrame, numLayers: Int): DataFrame = {
    // normalize each layer: (A + I) row-normalized. NOT cached: `layer` is
    // a window-partitioning column, so each per-layer branch pushes its
    // layer predicate below the window and down to the source scan — L
    // branches each read/shuffle 1/L of the table (one full pass in total),
    // and no executor storage outlives the call (a cache here leaked
    // storage memory across repeated calls — round-1 advisor finding).
    val rowSums = Window.partitionBy(col("image_key"), col("layer"), col("i"))
    val normed = attn
      .withColumn("a", col("a").cast("double") +
        when(col("i") === col("j"), 1.0).otherwise(0.0))
      .withColumn("a", col("a") / sum(col("a")).over(rowSums))

    def layer(l: Int): DataFrame =
      normed.filter(col("layer") === l).select(col("image_key"), col("i"), col("j"), col("a"))

    var rollout = layer(0)
    var l = 1
    while (l < numLayers) {
      val next = layer(l)
      // rollout = next · rollout  (new layer applied on the left)
      rollout = next.as("n")
        .join(rollout.as("r"),
          col("n.image_key") === col("r.image_key") && col("n.j") === col("r.i"))
        .groupBy(col("n.image_key").as("image_key"),
          col("n.i").as("i"), col("r.j").as("j"))
        .agg(sum(col("n.a") * col("r.a")).as("a"))
      l += 1
    }
    rollout.filter(col("i") === 0)
      .select(col("image_key"), col("j"), col("a").as("weight"))
  }
}
