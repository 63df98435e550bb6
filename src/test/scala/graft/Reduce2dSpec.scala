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

  test("reduce2d rejects unknown methods") {
    val emb = Tables.embeddings(spark, sf001)
    intercept[IllegalArgumentException] {
      Reduce2d(emb, "embedding", "vec_id", "label", method = "umap")
    }
  }
}
