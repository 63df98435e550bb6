package graft

import graft.pipelines.DeepfakeAnalysis
import org.apache.spark.sql.functions._

/** End-to-end flows over the testdata embeddings: the reference's two
  * analysis entry points as single library calls (SURVEY.md §3.2/§3.3).
  */
class PipelineSpec extends SparkSpec {

  test("embeddingMap: sampled 2-D coordinates + per-group counts (flow 3.2)") {
    val emb = Tables.embeddings(spark, sf001)
    val out = DeepfakeAnalysis.embeddingMap(
      emb, "embedding", "vec_id", "label", method = "pca", samplePerGroup = 20)
    val coords = out.coords.collect()
    assert(coords.length == 200) // 10 groups × 20 cap
    assert(out.coords.columns.toSeq == Seq("id", "label", "x", "y"))
    val counts = out.groupCounts.collect().map(r => r.get(0).toString -> r.getLong(1))
    assert(counts.length == 10 && counts.forall(_._2 == 20))
  }

  test("multimodal retrieval composes: frames -> embeddings -> ANN top-k") {
    import graft.operators.SimilaritySearch
    import graft.sources.{Embedder, Multimodal, StubEmbedder}
    import org.apache.spark.sql.Row
    // 3 videos → stride-sampled frames → stub embeddings → nearest frames
    val rows = java.util.Arrays.asList(
      Row(1L, "video", Row(null, null, 5000L, null, "h264"), Array[Byte](1, 2, 3)),
      Row(2L, "video", Row(null, null, 3000L, null, "h264"), Array[Byte](4, 5)),
      Row(3L, "video", Row(null, null, 4000L, null, "h264"), Array[Byte](6)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val frames = Multimodal.sampleFrames(media, strideMs = 1000L, maxFrames = 8)
      .select(
        concat(col("asset_id"), lit("/"), col("frame_idx")).as("path"),
        col("frame").as("content"))
    val embedded = Embedder.embedImages(frames, new StubEmbedder(16))
      .withColumn("vec_id", monotonically_increasing_id())
    val n = embedded.count()
    assert(n == 12) // 5 + 3 + 4 frames
    val hits = SimilaritySearch.bruteForceTopK(
      embedded, embedded.limit(2), k = 3, idCol = "vec_id", vecCol = "embedding")
    val out = hits.collect()
    assert(out.length == 2 * 3)
    assert(out.forall(r => r.getDouble(3) <= 1.0 + 1e-9))
  }

  test("compareSpaces: aligned counts, per-group CKA, separability (flow 3.3)") {
    val emb = Tables.embeddings(spark, sf001)
    // two "spaces": first/second halves of the embedding — same images,
    // different feature spaces, exactly the reference's comparison shape
    val a = emb.select(col("label"), col("vec_id"), slice(col("embedding"), 1, 32).as("v"))
    val b = emb.select(col("label"), col("vec_id"), slice(col("embedding"), 33, 32).as("v"))
    val out = DeepfakeAnalysis.compareSpaces(a, b, "v", "vec_id", "label",
      maxPerGroup = 30, cvFolds = 2)
    val counts = out.alignedCounts.collect()
    assert(counts.length == 10)
    assert(counts.forall(_.getLong(1) <= 30))
    val cka = out.ckaPerGroup.collect()
    assert(cka.length == 10)
    assert(cka.forall { r => val c = r.getDouble(1); c >= -1e-9 && c <= 1.0 + 1e-9 })
    assert(out.separabilityA >= 0.0 && out.separabilityA <= 1.0)
    assert(out.separabilityB >= 0.0 && out.separabilityB <= 1.0)
  }
}
