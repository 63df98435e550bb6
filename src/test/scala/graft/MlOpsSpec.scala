package graft

import graft.ml.MlOps
import org.apache.spark.sql.functions._

class MlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("indexLabels assigns contiguous ids in alphabetic order") {
    val df = Seq("wukong", "adm", "biggan", "adm").toDF("group")
    val out = MlOps.indexLabels(df, "group").distinct()
      .collect().map(r => r.getString(0) -> r.getAs[Double]("label_idx")).toMap
    assert(out == Map("adm" -> 0.0, "biggan" -> 1.0, "wukong" -> 2.0))
  }

  test("standardScale yields ~zero mean, ~unit variance per dim") {
    val df = Tables.embeddings(spark, sf001)
    val scaled = MlOps.standardScale(df, "embedding")
    val stats = scaled
      .select(posexplode(col("scaled")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(avg("v").as("mu"), stddev_samp(col("v")).as("sd"))
      .collect()
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("mu")) < 1e-8)
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-6)
    }
  }

  test("PCA recovers a rank-2 synthetic dataset with ~100% EVR in 2 components") {
    // 200 points on a 2-D plane embedded in 8-D
    val rng = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      val a = rng.nextGaussian(); val b = rng.nextGaussian()
      Array.tabulate(8)(j => (a * (j + 1) + b * math.pow(-1, j)).toFloat).toSeq
    }
    val df = rows.toDF("embedding")
    val (_, evr) = MlOps.pca(df, "embedding", k = 2)
    assert(evr.sum > 0.99, s"EVR = ${evr.toSeq}")
  }

  test("logreg CV separates separable groups, not identical ones") {
    val rng = new scala.util.Random(7)
    def blob(center: Double, label: Int, n: Int, from: Int) =
      (0 until n).map { i =>
        (from + i.toLong, label,
          Array.tabulate(4)(_ => (center + rng.nextGaussian() * 0.05).toFloat).toSeq)
      }
    val separable = (blob(0.0, 0, 60, 0) ++ blob(5.0, 1, 60, 1000))
      .toDF("id", "y", "embedding")
    val accSep = MlOps.logregCvAccuracy(separable, "embedding", "y", "id", k = 3)
    assert(accSep > 0.95, s"separable acc = $accSep")

    val identical = (blob(1.0, 0, 60, 0) ++ blob(1.0, 1, 60, 1000))
      .toDF("id", "y", "embedding")
    val accId = MlOps.logregCvAccuracy(identical, "embedding", "y", "id", k = 3)
    assert(accId < 0.8, s"identical-distribution acc = $accId")
  }

  test("fold assignment is deterministic and covers all folds") {
    val df = Tables.embeddings(spark, sf001)
    val folds = MlOps.withFold(df, "vec_id", k = 5)
    val counts = folds.groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3, 4))
    val again = MlOps.withFold(df, "vec_id", k = 5)
      .select("vec_id", "fold").collect().toSet
    assert(again == folds.select("vec_id", "fold").collect().toSet)
  }

  test("concatFeatures concatenates arrays") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f))).toDF("a", "b")
    val out = MlOps.concatFeatures(df, "a", "b").head().getSeq[Float](2)
    assert(out == Seq(1.0f, 2.0f, 3.0f))
  }
}
