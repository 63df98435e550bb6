package graft

import graft.operators.SetJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Naive ground truth: exact jaccard over ALL pairs sharing any token. */
  private def naive(docs: DataFrame, t: Double): Set[(Long, Long, Long)] = {
    val tok = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").distinct()
    val sz = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = tok.as("a")
      .join(tok.as("b"), col("a.w") === col("b.w") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    inter.join(sz.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sz.as("s2"), col("d2") === col("s2.doc_id"))
      .filter(col("c").cast("double") /
        (col("s1.n") + col("s2.n") - col("c")) >= t)
      .select(col("d1"), col("d2"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def viaPrefix(docs: DataFrame, t: Double): Set[(Long, Long, Long)] =
    SetJoin.jaccardJoin(docs, t)
      .select($"id_a", $"id_b", $"n_common")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("prefix-filtered join equals the naive full-index join on real data") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    Seq(0.5, 0.7, 0.9).foreach { t =>
      val fast = viaPrefix(docs, t)
      val truth = naive(docs, t)
      assert(fast == truth,
        s"t=$t: missing ${(truth -- fast).take(3)}, extra ${(fast -- truth).take(3)}")
      assert(truth.nonEmpty, s"t=$t produced no pairs — vacuous check")
    }
  }

  test("adversarial sizes: tiny sets, identical sets, disjoint sets") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),        // identical -> jaccard 1
      (3L, "a b c e"),        // 3/5 = 0.6 with 1
      (4L, "x y z w"),        // disjoint from 1-3
      (5L, "a"),              // singleton
      (6L, "a")               // identical singleton -> jaccard 1 with 5
    ).toDF("doc_id", "text")
    val out = viaPrefix(docs, 0.9)
    assert(out.map(p => (p._1, p._2)) == Set((1L, 2L), (5L, 6L)))
    val out06 = viaPrefix(docs, 0.6)
    assert(out06.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (5L, 6L), (1L, 3L), (2L, 3L)))
  }

  test("prefix index is smaller than the full index (the filter does work)") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val tok = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").distinct()
    val fullPostings = tok.count()
    val t = 0.9
    val freq = tok.groupBy($"w").agg(count(lit(1)).as("__f"))
    val prefixPostings = tok.join(freq, "w")
      .groupBy($"doc_id").agg(
        array_sort(collect_list(struct($"__f", $"w"))).as("s"))
      .select(slice($"s", lit(1),
        (size($"s") - ceil(size($"s") * lit(t / (1 + t))) + 1).cast("int"))
        .as("p"))
      .select(explode($"p")).count()
    // t/(1+t) ≈ 0.47 at t=0.9 -> prefix keeps ~53% of postings, and those
    // are the RAREST (shortest-posting) tokens — both effects are the
    // filter's work. Pin the size half; SetJoin's scaladoc covers the
    // posting-length skew.
    assert(prefixPostings < (fullPostings * 6) / 10,
      s"prefix $prefixPostings vs full $fullPostings")
  }
}
