package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reduce2d facade (SURVEY.md §2.8 M5/M6, §7.2 step 3): project an
  * embedding table to 2-D for the reference's scatter analyses.
  *
  *  - method="pca": fully distributed (MLlib), any scale.
  *  - method="tsne": driver-side exact t-SNE on a BOUNDED sample — the
  *    sample cap is enforced here with the deterministic hash-order
  *    sampler (L1), mirroring the reference, which never t-SNEs more than
  *    ~500 rows/group (sbatch --sample_per_model 500). The collect is
  *    bounded by construction: maxPerGroup × |groups| rows.
  *
  * Output schema: (id, label, x, y).
  */
object Reduce2d {

  def apply(df: DataFrame, vecCol: String, idCol: String, labelCol: String,
      method: String = "pca", maxPerGroup: Int = 500, seed: Long = 42L,
      perplexity: Double = 30.0, iterations: Int = 500): DataFrame = {

    val w = Window.partitionBy(col(labelCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    val sampled = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")

    method match {
      case "pca" =>
        val (projected, _) = MlOps.pca(sampled, vecCol, k = 2)
        projected.select(col(idCol).as("id"), col(labelCol).as("label"),
          element_at(col("pc"), 1).as("x"), element_at(col("pc"), 2).as("y"))

      case "tsne" =>
        val rows = sampled
          .select(col(idCol).cast("long"), col(labelCol).cast("string"), col(vecCol))
          .collect()
        if (rows.isEmpty) {
          df.sparkSession.createDataFrame(
            new java.util.ArrayList[Row](), outSchema)
        } else {
          val x = rows.map(_.getSeq[Float](2).map(_.toDouble).toArray)
          val yCoords = Tsne.fitTransform(x, perplexity, iterations, seed)
          val out = rows.zip(yCoords).map { case (r, c) =>
            Row(r.getLong(0), r.getString(1), c(0), c(1))
          }
          df.sparkSession.createDataFrame(
            java.util.Arrays.asList(out: _*), outSchema)
        }

      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }
  }

  private val outSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("label", StringType, nullable = true),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
}
