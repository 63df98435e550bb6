package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val targetish = Seq(
    "the model trains on curated scientific text about physics experiments",
    "curated scientific text improves model quality on physics benchmarks",
    "physics experiments generate curated scientific measurement text")
  private val offTarget = Seq(
    "buy cheap watches online free shipping discount offer today",
    "click here casino bonus jackpot winner prize lottery",
    "discount offer free shipping buy online cheap today")

  test("target-like documents outrank off-target ones") {
    val raw = (targetish ++ offTarget).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .repartition(3)
    val target = targetish.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val picked = Dsir.select(raw, target, keep = 3)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(picked == Set(0L, 1L, 2L), s"picked $picked")
    // and every target-like weight strictly exceeds every off-target one
    val t = Dsir.bucketCounts(target)
    val r = Dsir.bucketCounts(raw)
    val w = Dsir.importanceWeights(raw, t, r)
      .select($"doc_id", $"dsir_weight").collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert((0L to 2L).map(w).min > (3L to 5L).map(w).max)
  }

  test("empty and single-token docs score 0 with 0 grams") {
    val raw = Seq((1L, ""), (2L, "word"), (3L, "two words")).toDF("doc_id", "text")
    val counts = Array.fill[Long](1 << 14)(0L)
    val byId = Dsir.importanceWeights(raw, counts, counts)
      .select($"doc_id", $"dsir_weight", $"n_grams").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(byId(1L) == ((0.0, 0)) && byId(2L) == ((0.0, 0)))
    assert(byId(3L)._2 == 1)
    // identical models -> log ratio 0 everywhere
    assert(byId(3L)._1 == 0.0)
  }

  test("weights are deterministic across partitionings") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val target = docs.filter($"doc_id" % 7 === 0)
    val t = Dsir.bucketCounts(target)
    val r = Dsir.bucketCounts(docs)
    def run(parts: Int): Map[Long, Double] =
      Dsir.importanceWeights(docs.repartition(parts), t, r)
        .select($"doc_id", $"dsir_weight").collect()
        .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(run(2) == run(11))
  }

  test("single-pass selectWhere equals the two-pass select on a predicate target") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text", $"source")
    val onePass = graft.operators.Dsir
      .selectWhere(docs, $"source" === "src0", keep = 20)
      .select($"doc_id", $"dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val twoPass = graft.operators.Dsir
      .select(docs, docs.filter($"source" === "src0"), keep = 20)
      .select($"doc_id", $"dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(onePass == twoPass)
  }

  test("bucket counts: size fixed, totals equal the corpus bigram count") {
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text")
    val nb = 1 << 10
    val counts = Dsir.bucketCounts(docs, numBuckets = nb)
    assert(counts.length == nb)
    val expected = docs.select($"text").as[String].collect()
      .map(t => math.max(Dsir.tokensOf(t).length - 1, 0).toLong).sum
    assert(counts.sum == expected)
  }
}
