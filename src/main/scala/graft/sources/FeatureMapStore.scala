package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine-native tensor store (SURVEY.md §1.4, S6/S8): replaces the
  * reference's per-(group,image,layer) .npz files
  * (src/feature_map_analysis.py:205,252) with one partitioned parquet table
  * of row-major tensors. Partitioning by (arch, group, layer) makes the
  * reference's directory filtering into partition pruning, and zstd parquet
  * replaces np.savez_compressed.
  */
object FeatureMapStore {

  val schema: StructType = StructType(Seq(
    StructField("arch", StringType, nullable = false),
    StructField("group", StringType, nullable = false),
    StructField("image_stem", StringType, nullable = false),
    StructField("layer", StringType, nullable = false),
    StructField("c", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("fmap", ArrayType(FloatType), nullable = false)))

  /** S8: compressed tensor sink. */
  def write(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("arch", "group", "layer")
      .parquet(path)

  /** S6: pruned tensor scan — group/layer predicates become partition
    * pruning, never opening non-matching files (the reference's listing-time
    * filter, SURVEY.md §4.1).
    */
  def read(spark: SparkSession, path: String,
      arch: Option[String] = None, group: Option[String] = None,
      layer: Option[String] = None): DataFrame = {
    var df = spark.read.parquet(path)
    arch.foreach(a => df = df.filter(col("arch") === a))
    group.foreach(g => df = df.filter(col("group") === g))
    layer.foreach(l => df = df.filter(col("layer") === l))
    df
  }

  /** Shape-validity predicate (P8): drop tensors whose payload length does
    * not match the declared C·H·W (the reference's ndim/shape checks,
    * src/analyze_embedding_with_tsne.py:51-53).
    */
  def validShapes(df: DataFrame): DataFrame =
    df.filter(size(col("fmap")) === col("c") * col("h") * col("w"))
}
