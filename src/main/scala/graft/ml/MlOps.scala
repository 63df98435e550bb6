package graft.ml

import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{PCA, StandardScaler, StringIndexer}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib surface (SURVEY.md §2.8 / §7.2 step 3): the reference's analysis
  * stages re-expressed as distributed estimators over the embeddings table.
  * All take (df with an ARRAY<FLOAT> column) and handle the array↔Vector
  * conversion at the boundary, so the rest of the engine stays on plain
  * SQL-typed columns.
  */
object MlOps {

  /** M7: group name → contiguous int id, alphabetic order (matches the
    * reference's sorted() enumerate, src/compare_xception_featuremaps.py:128-137).
    */
  def indexLabels(df: DataFrame, labelCol: String, outCol: String = "label_idx"): DataFrame =
    new StringIndexer()
      .setInputCol(labelCol).setOutputCol(outCol)
      .setStringOrderType("alphabetAsc")
      .fit(df).transform(df)

  /** M4: zero-mean unit-variance scaling of the vector column
    * (src/analyze_embedding_with_pca.py:74-78).
    */
  def standardScale(df: DataFrame, vecCol: String, outCol: String = "scaled"): DataFrame = {
    val withVec = df.withColumn("__v", array_to_vector(col(vecCol)))
    val model = new StandardScaler()
      .setInputCol("__v").setOutputCol("__s")
      .setWithMean(true).setWithStd(true)
      .fit(withVec)
    model.transform(withVec)
      .withColumn(outCol, vector_to_array(col("__s")))
      .drop("__v", "__s")
  }

  /** M5/A11: PCA to k dims + explained-variance ratios
    * (src/analyze_embedding_with_pca.py:80-86). Returns (projected df with
    * outCol ARRAY<DOUBLE>, explainedVariance per component).
    */
  def pca(df: DataFrame, vecCol: String, k: Int = 2,
      outCol: String = "pc"): (DataFrame, Array[Double]) = {
    val withVec = df.withColumn("__v", array_to_vector(col(vecCol)))
    val model = new PCA().setInputCol("__v").setOutputCol("__p").setK(k).fit(withVec)
    val out = model.transform(withVec)
      .withColumn(outCol, vector_to_array(col("__p")))
      .drop("__v", "__p")
    (out, model.explainedVariance.toArray)
  }

  /** Deterministic fold assignment: pmod(xxhash64(id, seed), k) — the
    * engine's seeded-sampling convention (SURVEY.md §4.1) applied to CV.
    */
  def withFold(df: DataFrame, idCol: String, k: Int = 5, seed: Long = 42L): DataFrame =
    df.withColumn("fold", pmod(xxhash64(col(idCol), lit(seed)), lit(k.toLong)).cast("int"))

  /** M8: k-fold CV mean accuracy of logistic regression on (vecCol → labelCol)
    * — the reference's separability score
    * (src/compare_embeddings_vs_features.py:45-47). Deterministic folds via
    * hash of idCol; each fold trains on k-1 folds, scores the held-out one.
    */
  def logregCvAccuracy(df: DataFrame, vecCol: String, labelCol: String,
      idCol: String, k: Int = 5, maxIter: Int = 100): Double =
    cvAccuracy(df, vecCol, labelCol, idCol, k) { (train, test) =>
      val lr = new LogisticRegression()
        .setFeaturesCol("__v").setLabelCol("__y")
        .setMaxIter(maxIter).setRegParam(1e-4)
      val m = lr.fit(train)
      m.transform(test)
    }

  /** M9: GBT CV accuracy — the in-Spark stand-in for the reference's XGBoost
    * config (src/compare_embeddings_vs_features.py:49-70). Binary labels only
    * (GBTClassifier constraint); callers pre-binarize multiclass.
    */
  def gbtCvAccuracy(df: DataFrame, vecCol: String, labelCol: String,
      idCol: String, k: Int = 5, maxIter: Int = 20): Double =
    cvAccuracy(df, vecCol, labelCol, idCol, k) { (train, test) =>
      val gbt = new GBTClassifier()
        .setFeaturesCol("__v").setLabelCol("__y")
        .setMaxIter(maxIter).setMaxDepth(5).setStepSize(0.1)
        .setSubsamplingRate(0.9).setSeed(42L)
      gbt.fit(train).transform(test)
    }

  private def cvAccuracy(df: DataFrame, vecCol: String, labelCol: String,
      idCol: String, k: Int)(
      fitScore: (DataFrame, DataFrame) => DataFrame): Double = {
    // Separability scoring runs on a bounded sample (a statistical score
    // needs ~1e4-1e5 rows, never the corpus), so coalesce it to a few fat
    // partitions: the iterative fitters below launch one job per
    // iteration/tree-level, and with default parallelism each of those jobs
    // pays full-cluster task-scheduling overhead to move a handful of rows.
    // 8 partitions cut GBT CV wall time 12.3 s → ~4 s at bench scale with
    // identical results (fold assignment is row-hash based, not
    // partition-based).
    val prepared = withFold(df, idCol, k)
      .withColumn("__v", array_to_vector(col(vecCol)))
      .withColumn("__y", col(labelCol).cast("double"))
      .select(col("__v"), col("__y"), col("fold"))
      .repartition(8)
      .cache()
    try {
      val evaluator = new MulticlassClassificationEvaluator()
        .setLabelCol("__y").setPredictionCol("prediction")
        .setMetricName("accuracy")
      // Folds are independent models over the same cached input, so fit
      // them concurrently (what MLlib's CrossValidator.setParallelism
      // does): iterative fitters spend most of their wall time in
      // per-iteration job latency, which the scheduler overlaps across
      // folds. GBT CV ~3× faster at bench scale; results unchanged
      // (each fold gets its own estimator instance and deterministic seed).
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val accs = Await.result(
        Future.sequence((0 until k).map { f => Future {
          val train = prepared.filter(col("fold") =!= f)
          val test = prepared.filter(col("fold") === f)
          evaluator.evaluate(fitScore(train, test))
        }}),
        Duration.Inf)
      accs.sum / k
    } finally prepared.unpersist()
  }

  /** M10: feature concatenation [emb ‖ feat]
    * (src/combined_embedding_features_comprations.py:218).
    */
  def concatFeatures(df: DataFrame, aCol: String, bCol: String,
      outCol: String = "combined"): DataFrame =
    df.withColumn(outCol, concat(col(aCol), col(bCol)))
}
