package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf001).cache()

  test("brute-force top-k: self excluded, k rows per query, descending cosine") {
    val queries = emb.filter(col("vec_id") < 5)
    val out = SimilaritySearch.bruteForceTopK(emb, queries, k = 10).collect()
    assert(out.length == 5 * 10)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val cosines = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b - 1e-12 },
        s"cosines not descending for query $qid")
      assert(!rows.exists(_.getLong(2) == qid), "self in neighbors")
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // low-similarity corpus (near-random 64-dim vectors): collision prob per
    // table ≈ (1-θ/π)^bits, so shorter signatures + more tables buy recall
    val approx = SimilaritySearch.lshTopK(emb, queries, k = 5,
      numTables = 16, bitsPerTable = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall too low: $recall")
  }

  test("LSH is deterministic for a fixed seed") {
    val queries = emb.filter(col("vec_id") < 3)
    val a = SimilaritySearch.lshTopK(emb, queries, k = 3).collect().toSeq
    val b = SimilaritySearch.lshTopK(emb, queries, k = 3).collect().toSeq
    assert(a == b)
  }
}
