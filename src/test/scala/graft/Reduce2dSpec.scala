package graft

import graft.ml.{Reduce2d, Tsne}
import org.apache.spark.sql.functions._

class Reduce2dSpec extends SparkSpec {
  import spark.implicits._

  test("tsne: shape, determinism, and cluster preservation on separable blobs") {
    val rng = new scala.util.Random(11)
    def blob(c: Double) = Array.fill(30)(Array.tabulate(6)(_ => c + rng.nextGaussian() * 0.05))
    val x = blob(0.0) ++ blob(10.0)
    val a = Tsne.fitTransform(x, perplexity = 10, iterations = 300)
    val b = Tsne.fitTransform(x, perplexity = 10, iterations = 300)
    assert(a.length == 60 && a.forall(_.length == 2))
    assert(a.zip(b).forall { case (p, q) => p.sameElements(q) }, "not deterministic")
    // t-SNE preserves local neighborhoods, not linear margins: assert 5-NN
    // label purity in the 2-D layout (what the reference's scatter plots
    // show as cluster separation)
    val labels = Array.fill(30)(0) ++ Array.fill(30)(1)
    def d2(p: Array[Double], q: Array[Double]) =
      math.pow(p(0) - q(0), 2) + math.pow(p(1) - q(1), 2)
    val pure = a.indices.count { i =>
      val nn = a.indices.filter(_ != i).sortBy(j => d2(a(i), a(j))).take(5)
      val votes = nn.count(j => labels(j) == labels(i))
      votes >= 3
    }
    assert(pure >= 54, s"5-NN label purity too low: $pure/60")
  }

  test("reduce2d pca path: distributed, keeps ids and labels, caps per group") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Reduce2d(emb, "embedding", "vec_id", "label", method = "pca",
      maxPerGroup = 10)
    val rows = out.collect()
    assert(rows.length == 100) // 10 labels × 10 cap
    assert(out.columns.toSeq == Seq("id", "label", "x", "y"))
  }

  test("reduce2d tsne path: bounded collect, output row per sampled input") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Reduce2d(emb, "embedding", "vec_id", "label", method = "tsne",
      maxPerGroup = 5, iterations = 50)
    assert(out.count() == 50) // 10 labels × 5 cap
  }

  test("full pca: every row mapped, landmark parity with the sample-only fit") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Reduce2d.full(emb, "embedding", "vec_id", "label",
      method = "pca", maxPerGroup = 10).cache()
    try {
      assert(out.columns.toSeq == Seq("id", "label", "x", "y", "is_landmark"))
      assert(out.count() == emb.count()) // one output row per input row
      assert(out.filter(col("is_landmark")).count() == 100) // 10 labels x 10
      // landmark coords equal the bounded-sample fit (same deterministic
      // hash-order sample, same fitted basis) up to float-summation noise
      // from differing partition layouts
      val sampleOnly = Reduce2d(emb, "embedding", "vec_id", "label",
          method = "pca", maxPerGroup = 10)
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      val fullLm = out.filter(col("is_landmark"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      assert(fullLm.keySet == sampleOnly.keySet, "landmark sample set differs")
      fullLm.foreach { case (id, (x, y)) =>
        val (sx, sy) = sampleOnly(id)
        assert(math.abs(x - sx) < 1e-6 && math.abs(y - sy) < 1e-6,
          s"landmark $id moved: ($x,$y) vs ($sx,$sy)")
      }
      // extension is deterministic
      val again = Reduce2d.full(emb, "embedding", "vec_id", "label",
          method = "pca", maxPerGroup = 10)
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      val first = out.collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      assert(again == first)
    } finally { out.unpersist(); () }
  }

  test("full tsne: landmarks keep their exact coords, extension lands near them") {
    val emb = Tables.embeddings(spark, sf001).filter(col("vec_id") < 100)
    val out = Reduce2d.full(emb, "embedding", "vec_id", "label",
      method = "tsne", maxPerGroup = 5, iterations = 50, knn = 3).cache()
    try {
      assert(out.count() == 100)
      // landmark coords are bit-equal to the sample-only fit (identical
      // id-ordered input to the identical deterministic optimizer)
      val sampleOnly = Reduce2d(emb, "embedding", "vec_id", "label",
          method = "tsne", maxPerGroup = 5, iterations = 50)
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      val lm = out.filter(col("is_landmark"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      assert(lm == sampleOnly, "landmark coords diverged from the bounded fit")
      // every extended point sits inside the landmark bounding box (a
      // convex combination of landmark coords cannot escape it)
      val (xs, ys) = (lm.values.map(_._1), lm.values.map(_._2))
      val ext = out.filter(!col("is_landmark")).collect()
      ext.foreach { r =>
        val (x, y) = (r.getDouble(2), r.getDouble(3))
        assert(x >= xs.min - 1e-9 && x <= xs.max + 1e-9 &&
          y >= ys.min - 1e-9 && y <= ys.max + 1e-9,
          s"extended point (${r.getLong(0)}) outside landmark hull bbox")
      }
      assert(ext.nonEmpty)
    } finally { out.unpersist(); () }
  }

  test("reduce2d rejects unknown methods") {
    val emb = Tables.embeddings(spark, sf001)
    intercept[IllegalArgumentException] {
      Reduce2d(emb, "embedding", "vec_id", "label", method = "umap")
    }
  }
}
