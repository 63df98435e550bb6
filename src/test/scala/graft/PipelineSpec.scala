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

  test("pairsMap: adjacent group pairs, per-pair 2-D maps, n>=3 guard (flow pairs)") {
    val emb = Tables.embeddings(spark, sf001)
    val out = DeepfakeAnalysis.pairsMap(
      emb, "embedding", "vec_id", "label",
      numPairs = 3, strategy = "adjacent", samplePerGroup = 10, method = "pca")
    // 10 sorted labels 0..9 → adjacent pairs (0,1) (2,3) (4,5), capped at 3
    assert(out.pairs == Seq(("0", "1"), ("2", "3"), ("4", "5")))
    val coords = out.coords.collect()
    assert(out.coords.columns.toSeq == Seq("pair", "id", "label", "x", "y"))
    // each pair: 2 groups × 10 cap
    val byPair = coords.groupBy(_.getString(0)).map { case (p, rs) => p -> rs.length }
    assert(byPair == Map("0|1" -> 20, "2|3" -> 20, "4|5" -> 20))
    // labels within a pair are exactly its two groups
    coords.filter(_.getString(0) == "2|3").foreach(r =>
      assert(Set("2", "3").contains(r.getString(2))))
  }

  test("pairsMap: random strategy is a deterministic hash-order sample; guard skips tiny pairs") {
    val emb = Tables.embeddings(spark, sf001)
    val a = DeepfakeAnalysis.pairsMap(emb, "embedding", "vec_id", "label",
      numPairs = 2, strategy = "random", samplePerGroup = 5, method = "pca")
    val b = DeepfakeAnalysis.pairsMap(emb, "embedding", "vec_id", "label",
      numPairs = 2, strategy = "random", samplePerGroup = 5, method = "pca")
    assert(a.pairs == b.pairs && a.pairs.length == 2)
    a.pairs.foreach { case (g1, g2) => assert(g1 < g2) }
    // n>=3 guard: cap of 1 per group over two groups can never reach 3 points
    val tiny = DeepfakeAnalysis.pairsMap(emb, "embedding", "vec_id", "label",
      numPairs = 2, strategy = "adjacent", samplePerGroup = 1, method = "pca")
    assert(tiny.coords.isEmpty)
  }

  test("separateMaps: independent per-group 2-D maps with n>=3 guard (flow separate)") {
    val emb = Tables.embeddings(spark, sf001)
    val out = DeepfakeAnalysis.separateMaps(
      emb, "embedding", "vec_id", "label", samplePerGroup = 10, method = "pca")
    assert(out.groups == (0 to 9).map(_.toString)) // all 10 labels qualify
    assert(out.coords.columns.toSeq == Seq("group", "id", "x", "y"))
    val coords = out.coords.collect()
    val byGroup = coords.groupBy(_.getString(0)).map { case (g, rs) => g -> rs.length }
    assert(byGroup == (0 to 9).map(g => g.toString -> 10).toMap)
    // independence: group "0"'s coords are identical whether or not other
    // groups exist in the input (a joint fit would shift them)
    val only0 = DeepfakeAnalysis.separateMaps(
      emb.filter(col("label").cast("string") === "0"),
      "embedding", "vec_id", "label", samplePerGroup = 10, method = "pca")
    val all0 = coords.filter(_.getString(0) == "0")
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val solo0 = only0.coords.collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(all0.toSeq == solo0.toSeq)
    // guard: a cap of 2 can never reach 3 points per group → no maps at all
    val tiny = DeepfakeAnalysis.separateMaps(
      emb, "embedding", "vec_id", "label", samplePerGroup = 2, method = "pca")
    assert(tiny.groups.isEmpty && tiny.coords.isEmpty)
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

  test("mx_deepfake_lifecycle gate entry: per-stage funnel matches the library calls") {
    val rows = SparkEntry.queries("mx_deepfake_lifecycle")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // ingest: 6 good PNGs + 1 corrupt member scanned; corrupt-skip drops 1
    assert(rows("0_ingested_files")._1 == 7L)
    assert(rows("1_stub_embedded")._1 == 6L)
    // 500 embeddings align across the two half-spaces; 10 groups × 30 cap
    assert(rows("2_aligned_spaces")._1 == 500L)
    assert(rows("3_equal_n_sampled")._1 == 300L)
    // 10 labels → 55 unordered centroid pairs incl. self; 10 × 20 PCA coords
    assert(rows("4_centroid_cosine_pairs")._1 == 55L)
    assert(rows("5_pca_coords")._1 == 200L)
    // separability metrics present, in [0,1], and EQUAL to the direct
    // library call (parity: the gate entry is the composed flows, not a
    // reimplementation)
    val emb = Tables.embeddings(spark, sf001)
    val a = emb.select(col("label"), col("vec_id"), slice(col("embedding"), 1, 32).as("v"))
    val b = emb.select(col("label"), col("vec_id"), slice(col("embedding"), 33, 32).as("v"))
    val direct = DeepfakeAnalysis.compareSpaces(a, b, "v", "vec_id", "label",
      maxPerGroup = 30, cvFolds = 2, lrMaxIter = 30)
    assert(rows("6_separability_space_a")._2.contains(direct.separabilityA))
    assert(rows("7_separability_space_b")._2.contains(direct.separabilityB))
    assert(Seq("6_separability_space_a", "7_separability_space_b").forall { k =>
      val m = rows(k)._2.get; m >= 0.0 && m <= 1.0
    })
  }

  test("compareSpaces: aligned counts, per-group CKA, separability (flow 3.3)") {
    val emb = Tables.embeddings(spark, sf001)
    // two "spaces": first/second halves of the embedding — same images,
    // different feature spaces, exactly the reference's comparison shape
    val a = emb.select(col("label"), col("vec_id"), slice(col("embedding"), 1, 32).as("v"))
    val b = emb.select(col("label"), col("vec_id"), slice(col("embedding"), 33, 32).as("v"))
    val out = DeepfakeAnalysis.compareSpaces(a, b, "v", "vec_id", "label",
      maxPerGroup = 30, cvFolds = 2, lrMaxIter = 30)
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
