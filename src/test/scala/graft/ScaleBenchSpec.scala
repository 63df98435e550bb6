package graft

import org.apache.spark.sql.functions._

/** The scaling-exponent methodology (BASELINE.md "Measured scaling
  * exponents") stands on the replica construction being DECORRELATED: a
  * ×F corpus must behave like F independent sf copies, not one corpus
  * duplicated F times — otherwise the dedup families are handed an
  * artificial quadratic workload and the measured exponents are about the
  * generator, not the engine. These specs pin the construction's
  * invariants.
  */
class ScaleBenchSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scalegen").toString
    ScaleBench.generate(spark, sf001, dir, factor = 4)
    dir
  }

  test("affine substitution alphabets: bijections, identity at k=0, pairwise distinct") {
    assert(ScaleBench.affineAlpha(0) == "abcdefghijklmnopqrstuvwxyz")
    val alphas = (0 until 100).map(ScaleBench.affineAlpha)
    // each is a permutation of the alphabet (26 distinct letters)
    alphas.foreach(a => assert(a.toSet.size == 26))
    // pairwise distinct — replica k and k' never share a letter mapping,
    // the flaw the earlier 9-letter rotation scheme had at k ≡ 0 (mod 9)
    assert(alphas.toSet.size == 100)
  }

  test("documents: 4x rows, zero cross-replica exact duplicates, marginals preserved") {
    val base = spark.read.parquet(s"$sf001/documents.parquet")
    val gen = spark.read.parquet(s"$out/documents.parquet")
    assert(gen.count() == 4 * base.count())
    // a letter bijection cannot merge texts, so distinct texts must grow
    // exactly 4x (up to duplicates already present within the base corpus)
    assert(gen.select(col("text")).distinct().count() ==
      4 * base.select(col("text")).distinct().count())
    // source/lang marginals replicate (bigger sources, not more sources)
    assert(gen.select(col("source")).distinct().count() ==
      base.select(col("source")).distinct().count())
    // length-preserving substitution keeps n_chars truthful
    assert(gen.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }

  test("embeddings: within-replica cosines preserved exactly, ids disjoint") {
    val base = spark.read.parquet(s"$sf001/embeddings.parquet")
    val gen = spark.read.parquet(s"$out/embeddings.parquet")
    assert(gen.count() == 4 * base.count())
    assert(gen.select(col("vec_id")).distinct().count() == gen.count())
    // rotation/negation is orthogonal: replica k's pairwise dot products
    // equal replica 0's bit-for-bit (same floats, same order of the
    // sequential sum after rotation of BOTH operands)
    def dots(df: org.apache.spark.sql.DataFrame, shift: Long) = df
      .filter(col("vec_id") >= shift && col("vec_id") < shift + 20)
      .select((col("vec_id") - shift).as("id"), col("embedding"))
      .as("a").crossJoin(
        df.filter(col("vec_id") >= shift && col("vec_id") < shift + 20)
          .select((col("vec_id") - shift).as("id2"), col("embedding").as("e2")))
      .filter(col("id") < col("id2"))
      .select(col("id"), col("id2"),
        aggregate(zip_with(col("embedding"), col("e2"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("dot"))
    val d0 = dots(gen, 0L).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val d2 = dots(gen, 20000000L).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(d0.keySet == d2.keySet)
    // |dot| identical (negation replicas flip both operands: sign cancels)
    d0.foreach { case (k, v) => assert(math.abs(math.abs(v) - math.abs(d2(k))) < 1e-9) }
  }

  test("customer: replica tags keep cross-replica names beyond edit distance 1") {
    val gen = spark.read.parquet(s"$out/customer.parquet")
    val r0 = gen.filter(col("c_custkey") < 10000000L)
      .select(col("c_name").as("a")).limit(30)
    val r1 = gen.filter(col("c_custkey") >= 10000000L && col("c_custkey") < 20000000L)
      .select(col("c_name").as("b")).limit(30)
    val minDist = r0.crossJoin(r1)
      .select(min(levenshtein(col("a"), col("b"))).as("d"))
      .head().getInt(0)
    assert(minDist > 1, s"cross-replica names within tau=1 (min dist $minDist)")
  }

  test("events: 4x rows, disjoint event and user ids, loader round-trips") {
    val gen = Tables.events(spark, out)
    val base = Tables.events(spark, sf001)
    assert(gen.count() == 4 * base.count())
    assert(gen.select(col("event_id")).distinct().count() == gen.count())
    // the ts column survives the write/read cycle as a usable timestamp
    assert(gen.filter(col("ts").isNull).count() == 0)
  }
}
