package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The model-inference boundary (SURVEY.md §2.8 M1–M3): the reference runs a
  * GPU CNN/ViT backbone over image batches (src/extract_embedding.py:48-93);
  * the engine treats that as a black box behind this interface. The contract
  * is dataflow-only: binary rows in, (row, embedding ARRAY<FLOAT>) out,
  * batched per partition so a real implementation can amortize model load
  * (executor-singleton) and batch device transfers — exactly the
  * DataLoader(batch=64) pattern, but per Spark task instead of per forked
  * worker.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Called once per batch of raw image bytes; returns one embedding per
    * input (null byte-arrays allowed → implementation-defined skip vector).
    */
  def embedBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]]
}

/** Deterministic stand-in for model weights (none ship in this environment):
  * embedding[i] = uniform(-1,1) derived from xxhash-style mixing of the
  * content bytes and i. Stable across runs/JVMs, so pipelines built on it are
  * testable end-to-end; swap in an ONNX/DJL-backed Embedder for real models.
  */
final class StubEmbedder(val dim: Int = 64) extends Embedder {
  def embedBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]] =
    contents.map { c =>
      val base = if (c == null) 0L
        else c.foldLeft(-7046029254386353131L)((a, b) => (a ^ b) * 1099511628211L)
      Array.tabulate(dim) { i =>
        var h = base ^ (i * 0x9E3779B97F4A7C15L)
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        ((h & 0xFFFFFF).toFloat / 0x7FFFFF.toFloat) - 1.0f
      }.map(v => v.max(-1.0f).min(1.0f))
    }
}

object Embedder {

  /** M1/M2 dataflow: images (path, content) → (path, embedding), batched
    * `mapPartitions` with per-partition embedder reuse — the Spark analog of
    * the reference's model-resident-on-device batching
    * (src/extract_embedding.py:77-93).
    */
  def embedImages(images: DataFrame, embedder: Embedder,
      batchSize: Int = 64): DataFrame = {
    val spark = images.sparkSession
    val outSchema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    val projected: Dataset[Row] = images.select(col("path"), col("content"))
    projected.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(_.getAs[Array[Byte]]("content")))
        batch.zip(vecs).map { case (row, v) =>
          Row(row.getAs[String]("path"), v.toSeq)
        }
      }
    }(enc)
  }
}
