package graft

import graft.pipelines.Explainability
import org.apache.spark.sql.functions._

class ExplainabilitySpec extends SparkSpec {
  import spark.implicits._

  test("gradCam: weighted sum -> normalize -> upsample, end to end") {
    val fmaps = Seq(
      ("resnet", "biggan", "img1", "stage3", 2, 2, 2,
        Seq(1f, 2f, 3f, 4f, 10f, 20f, 30f, 40f)))
      .toDF("arch", "group", "image_stem", "layer", "c", "h", "w", "fmap")
    val weights = Seq(("img1", "stage3", Seq(1.0, 0.1)))
      .toDF("image_stem", "layer", "weights")
    val out = Explainability.gradCam(fmaps, weights, outH = 4, outW = 4).collect()
    assert(out.length == 1)
    val cam = out.head.getSeq[Double](out.head.fieldIndex("cam"))
    assert(cam.length == 16)
    assert(cam.forall(v => v >= 0.0 && v <= 1.0 + 1e-9))
    // raw cam = [2,4,6,8] → normalized corners 0 and 1 survive upsampling
    assert(math.abs(cam.head) < 1e-9 && math.abs(cam.last - 1.0) < 1e-6)
  }

  test("attentionHeatmap: rollout -> grid -> heatmap with correct shape") {
    // 1 layer, 5 tokens: CLS + 2x2 patch grid
    val rng = new scala.util.Random(9)
    val rows = for (i <- 0 until 5; j <- 0 until 5)
      yield ("imgA", 0, i, j, (rng.nextDouble() * 0.5 + 0.1).toFloat)
    val attn = rows.toDF("image_key", "layer", "i", "j", "a")
    val out = Explainability.attentionHeatmap(attn, numLayers = 1, gridSide = 2,
      outH = 8, outW = 8).collect()
    assert(out.length == 1)
    val hm = out.head.getSeq[Double](out.head.fieldIndex("heatmap"))
    assert(hm.length == 64)
    assert(hm.forall(v => v >= -1e-9 && v <= 1.0 + 1e-9))
    assert(hm.exists(v => v > 0.99), "max should normalize to 1")
  }
}
