package graft

import graft.operators.TensorOps
import graft.sources.FeatureMapStore
import org.apache.spark.sql.functions._

class TensorSpec extends SparkSpec {
  import spark.implicits._

  // one 2-channel 2x2 tensor, row-major C·H·W:
  // ch0 = [[1,2],[3,4]], ch1 = [[10,20],[30,40]]
  private val fmapRow = Seq(
    ("resnet", "biggan", "img1", "stage3", 2, 2, 2,
      Seq(1f, 2f, 3f, 4f, 10f, 20f, 30f, 40f)))
  private def fmapDf = fmapRow
    .toDF("arch", "group", "image_stem", "layer", "c", "h", "w", "fmap")

  test("globalAveragePool: [C,H,W] -> per-channel mean") {
    val out = fmapDf.select(
      TensorOps.globalAveragePool(col("fmap"), col("c"), col("h"), col("w")).as("gap"))
      .head().getSeq[Double](0)
    assert(out == Seq(2.5, 25.0))
  }

  test("camWeightedSum: weighted channel sum with relu") {
    // weights (1, -0.1): pixel p = max(0, 1*ch0[p] - 0.1*ch1[p]) = 0 everywhere
    val out = fmapDf
      .withColumn("weights", typedLit(Seq(1.0, -0.1)))
      .select(TensorOps.camWeightedSum(col("fmap"), col("weights"),
        col("c"), col("h"), col("w")).as("cam"))
      .head().getSeq[Double](0)
    assert(out == Seq(0.0, 0.0, 0.0, 0.0))
    // weights (1, 0.1): p = ch0[p] + 0.1*ch1[p] = [2,4,6,8]
    val out2 = fmapDf
      .withColumn("weights", typedLit(Seq(1.0, 0.1)))
      .select(TensorOps.camWeightedSum(col("fmap"), col("weights"),
        col("c"), col("h"), col("w")).as("cam"))
      .head().getSeq[Double](0)
    assert(out2.zip(Seq(2.0, 4.0, 6.0, 8.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("denormalize: per-channel x*std + mean with [0,1] clamp (A7)") {
    // [2,1,2] tensor: ch0 = [0.5, -3.0], ch1 = [1.0, 4.0]
    // means (0.4, 0.5), stds (0.2, 0.25):
    //   ch0: 0.5*0.2+0.4 = 0.5 ; -3.0*0.2+0.4 = -0.2 → clamp 0.0
    //   ch1: 1.0*0.25+0.5 = 0.75 ; 4.0*0.25+0.5 = 1.5 → clamp 1.0
    val img = Seq((Seq(0.5f, -3.0f, 1.0f, 4.0f), 2, 1, 2))
      .toDF("img", "c", "h", "w")
    val out = img.select(TensorOps.denormalize(col("img"),
        typedLit(Seq(0.4, 0.5)), typedLit(Seq(0.2, 0.25)),
        col("c"), col("h"), col("w")).as("d"))
      .head().getSeq[Double](0)
    assert(out.zip(Seq(0.5, 0.0, 0.75, 1.0)).forall { case (a, b) =>
      math.abs(a - b) < 1e-7 }, s"denormalize: $out")
  }

  test("originalImage: ImageNet denormalize + truncating uint8 pixel scale") {
    // a [3,1,1] zero tensor; ch R: 0*0.229+0.485 = 0.485 → floor(123.675) = 123
    val img = Seq((Seq(0.0f, 0.0f, 0.0f), 1, 1)).toDF("img", "h", "w")
    val px = graft.pipelines.Explainability.originalImage(img)
      .head().getAs[scala.collection.Seq[Int]]("pixels")
    assert(px == Seq(123, 116, 103), s"pixels: $px")
  }

  test("minMaxNormalize maps to [0,1] with eps guard") {
    val out = Seq(Seq(2.0, 4.0, 6.0)).toDF("m")
      .select(TensorOps.minMaxNormalize(col("m")).as("n"))
      .head().getSeq[Double](0)
    assert(math.abs(out(0)) < 1e-9 && math.abs(out(2) - 1.0) < 1e-6)
    assert(math.abs(out(1) - 0.5) < 1e-6)
    // constant plane stays finite (eps), all zeros
    val const = Seq(Seq(5.0, 5.0)).toDF("m")
      .select(TensorOps.minMaxNormalize(col("m")).as("n"))
      .head().getSeq[Double](0)
    assert(const.forall(v => v == 0.0))
  }

  test("bilinearUpsample: identity at same size, interpolates at 2x") {
    val plane = Seq((Seq(0.0, 1.0, 2.0, 3.0), 2, 2)).toDF("p", "h", "w")
    val same = plane.select(
      TensorOps.bilinearUpsample(col("p"), col("h"), col("w"), 2, 2).as("o"))
      .head().getSeq[Double](0)
    assert(same == Seq(0.0, 1.0, 2.0, 3.0))
    val up = plane.select(
      TensorOps.bilinearUpsample(col("p"), col("h"), col("w"), 4, 4).as("o"))
      .head().getSeq[Double](0)
    assert(up.length == 16)
    // corners preserved under half-pixel mapping with clamping
    assert(up.head == 0.0 && math.abs(up.last - 3.0) < 1e-12)
    // monotone along the first row
    val row0 = up.take(4)
    assert(row0.zip(row0.tail).forall { case (a, b) => a <= b + 1e-12 })
  }

  test("attentionRollout equals driver-side matrix chain on a 2-layer example") {
    // 2 layers of 3x3 attention for one image
    val rng = new scala.util.Random(3)
    val a = Array.fill(2, 3, 3)(rng.nextDouble())
    val rows = for (l <- 0 until 2; i <- 0 until 3; j <- 0 until 3)
      yield ("img1", l, i, j, a(l)(i)(j).toFloat)
    val attn = rows.toDF("image_key", "layer", "i", "j", "a")
    val got = TensorOps.attentionRollout(attn, 2)
      .collect().map(r => r.getInt(r.fieldIndex("j")) -> r.getDouble(r.fieldIndex("weight"))).toMap

    // driver-side reference: rownorm(A_l + I), rollout = A1' * A0', CLS row
    def normed(l: Int): Array[Array[Double]] = {
      val m = Array.tabulate(3, 3)((i, j) => a(l)(i)(j) + (if (i == j) 1.0 else 0.0))
      m.map { r => val s = r.sum; r.map(_ / s) }
    }
    val (m0, m1) = (normed(0), normed(1))
    val prod = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => m1(i)(k) * m0(k)(j)).sum)
    (0 until 3).foreach { j =>
      assert(math.abs(got(j) - prod(0)(j)) < 1e-6, s"j=$j")
    }
  }

  test("GAP tensor form agrees with VecAgg.meanVec on 1x1 planes") {
    // a [C,1,1] tensor's GAP equals the identity; grouping such rows and
    // mean-pooling must agree with the typed vector-mean aggregator
    val rows = (1 to 6).map(i =>
      ("g", s"img$i", 3, 1, 1, Seq(i.toFloat, i * 2.0f, i * 3.0f)))
    val df = rows.toDF("group", "image_stem", "c", "h", "w", "fmap")
    val viaGap = df
      .select(col("group"),
        TensorOps.globalAveragePool(col("fmap"), col("c"), col("h"), col("w")).as("gap"))
      .select(col("group"), col("gap")(0).as("a"), col("gap")(1).as("b"), col("gap")(2).as("cc"))
      .groupBy("group").agg(avg("a"), avg("b"), avg("cc"))
      .head()
    val viaAgg = df.groupBy("group")
      .agg(graft.operators.VecAgg.meanVec(col("fmap")).as("m"))
      .head().getSeq[Double](1)
    assert(math.abs(viaGap.getDouble(1) - viaAgg(0)) < 1e-9)
    assert(math.abs(viaGap.getDouble(2) - viaAgg(1)) < 1e-9)
    assert(math.abs(viaGap.getDouble(3) - viaAgg(2)) < 1e-9)
  }

  test("FeatureMapStore round-trip with partition pruning and shape validation") {
    val dir = java.nio.file.Files.createTempDirectory("fmap_store").toString
    val bad = Seq(("resnet", "glide", "img2", "stage3", 2, 2, 2, Seq(1f, 2f)))
      .toDF("arch", "group", "image_stem", "layer", "c", "h", "w", "fmap")
    FeatureMapStore.write(fmapDf.unionByName(bad), dir)
    val back = FeatureMapStore.read(spark, dir, group = Some("biggan"))
    assert(back.count() == 1)
    assert(back.head().getAs[String]("image_stem") == "img1")
    // partition pruning visible in the plan
    val plan = back.queryExecution.executedPlan.toString
    assert(back.select("fmap").head().getSeq[Float](0).length == 8)
    val all = FeatureMapStore.read(spark, dir)
    assert(all.count() == 2 && FeatureMapStore.validShapes(all).count() == 1)
  }
}
