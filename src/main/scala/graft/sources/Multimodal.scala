package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star): image/audio/video payloads are
  * opaque BINARY columns beside typed metadata structs; decode / resize /
  * frame-sample run as batched per-partition transforms so a real codec
  * (ffmpeg/libjpeg behind JNI, or Python workers at the boundary) slots in
  * without touching the relational plan. The codecs themselves are
  * deterministic STUBS here (no media libraries ship in this environment —
  * SURVEY.md §7.3); schema, partitioning, batch shape, and null/corrupt
  * handling are the real, tested contract.
  */
object Multimodal {

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  private val frameSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling: video payload → one row per sampled frame at a fixed
    * stride. Generator shape (1 row in → F rows out) via flatMap inside
    * mapPartitions; the STUB derives per-frame bytes deterministically from
    * (payload hash, frame index) — a real impl calls the decoder per batch.
    * Null/empty payloads and zero-duration assets yield no frames
    * (corrupt-skip semantics, S3).
    */
  def sampleFrames(media: DataFrame, strideMs: Long = 1000L,
      maxFrames: Int = 32): DataFrame = {
    val enc = ExpressionEncoder(frameSchema)
    media
      .filter(col("kind") === "video" && col("payload").isNotNull)
      .select(col("asset_id"), col("meta.duration_ms").as("duration_ms"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val dur = if (r.isNullAt(1)) 0L else r.getLong(1)
          val payload = r.getAs[Array[Byte]]("payload")
          val n = math.min(if (strideMs <= 0) 0L else dur / strideMs, maxFrames.toLong).toInt
          val base = payload.foldLeft(-7046029254386353131L)((a, b) => (a ^ b) * 1099511628211L)
          (0 until n).iterator.map { f =>
            val bytes = Array.tabulate[Byte](32)(i => ((base ^ (f * 131L)) >> (i % 56) & 0xFF).toByte)
            Row(r.getLong(0), f, f * strideMs, bytes)
          }
        }
      }(enc)
  }

  /** Image resize: payload → fixed-size pseudo-pixel buffer + updated meta.
    * STUB pixels; the contract is (payload, target) → deterministic
    * fixed-shape output with meta carrying the new dimensions.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val resize = udf { (payload: Array[Byte]) =>
      if (payload == null) None
      else {
        val base = payload.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
        Some(Array.tabulate[Byte](w * h * 3)(i => ((base >> (i % 56)) & 0xFF).toByte))
      }
    }
    media.filter(col("kind") === "image")
      .withColumn("resized", resize(col("payload")))
      .withColumn("resized_w", when(col("resized").isNotNull, lit(w)))
      .withColumn("resized_h", when(col("resized").isNotNull, lit(h)))
  }

  /** Audio feature extraction: payload → fixed-length feature vector
    * (STUB: hash-derived; real impl = filterbank/MFCC over PCM frames).
    */
  def audioFeatures(media: DataFrame, dim: Int = 32): DataFrame = {
    val feats = udf { (payload: Array[Byte]) =>
      if (payload == null) None
      else {
        val base = payload.foldLeft(-7046029254386353131L)((a, b) => (a ^ b) * 1099511628211L)
        Some(Array.tabulate(dim) { i =>
          var x = base ^ (i * 0x9E3779B97F4A7C15L)
          x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
          ((x & 0xFFFFFF).toFloat / 0x7FFFFF.toFloat) - 1.0f
        })
      }
    }
    media.filter(col("kind") === "audio")
      .withColumn("features", feats(col("payload")))
  }
}
