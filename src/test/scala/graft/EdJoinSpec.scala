package graft

import graft.operators.EdJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EdJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Naive ground truth: levenshtein over the full cross product. */
  private def naive(df: DataFrame, tau: Int): Set[(Long, Long, Long)] = {
    val a = df.select($"id".as("ia"), $"s".as("sa"))
    val b = df.select($"id".as("ib"), $"s".as("sb"))
    a.crossJoin(b).filter($"ia" < $"ib")
      .withColumn("d", levenshtein($"sa", $"sb"))
      .filter($"d" <= tau)
      .select($"ia", $"ib", $"d".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def viaFilter(df: DataFrame, tau: Int, q: Int = 2)
      : Set[(Long, Long, Long)] =
    EdJoin.edJoin(df, tau, q = q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("q-gram-filtered join equals the naive cross join on real names") {
    val names = Tables.customer(spark, sf01)
      .filter($"c_custkey" < 400)
      .select($"c_custkey".as("id"), $"c_name".as("s"))
    Seq(1, 2).foreach { tau =>
      val fast = viaFilter(names, tau)
      val truth = naive(names, tau)
      assert(fast == truth,
        s"tau=$tau: missing ${(truth -- fast).take(3)}, extra ${(fast -- truth).take(3)}")
      assert(truth.nonEmpty, s"tau=$tau produced no pairs — vacuous check")
    }
  }

  test("degenerate strings: empty, shorter than q, identical, unicode") {
    val df = Seq(
      (1L, ""),        // empty
      (2L, "a"),       // 1 char: ed("", "a") = 1
      (3L, "b"),       // ed("a","b") = 1
      (4L, "ab"),      // ed("a","ab") = 1
      (5L, "ab"),      // identical -> ed 0
      (6L, "xyzzy"),   // far from everything
      (7L, "café"), // unicode
      (8L, "cafe")     // ed 1 from café
    ).toDF("id", "s")
    Seq(0, 1, 2).foreach { tau =>
      assert(viaFilter(df, tau) == naive(df, tau), s"tau=$tau diverged")
    }
    // the pairs the padding exists for: short strings must still pair up
    assert(viaFilter(df, 1).map(p => (p._1, p._2))
      .intersect(Set((1L, 2L), (2L, 3L), (7L, 8L))) ==
      Set((1L, 2L), (2L, 3L), (7L, 8L)))
  }

  test("q=3 grams stay complete too") {
    val names = Tables.customer(spark, sf01)
      .filter($"c_custkey" < 300)
      .select($"c_custkey".as("id"), $"c_name".as("s"))
    assert(viaFilter(names, 1, q = 3) == naive(names, 1))
  }

  test("null strings produce no pairs — matching SQL levenshtein semantics") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("abc")),
      (3L, Some("abd")), (4L, Option.empty[String])).toDF("id", "s")
    val got = EdJoin.edJoin(df, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // levenshtein(NULL, x) is NULL in SQL -> never <= tau; only (2,3) pairs
    assert(got == Set((2L, 3L)), s"null handling diverged: $got")
  }

  test("posting cap trades recall for work, never precision") {
    val names = Tables.customer(spark, sf01)
      .filter($"c_custkey" < 300)
      .select($"c_custkey".as("id"), $"c_name".as("s"))
    val truth = naive(names, 1)
    val capped = EdJoin.edJoin(names, 1, maxPostingSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped.subsetOf(truth), "cap must not create false pairs")
  }

  test("non-numeric id column fails fast instead of silently emptying the join") {
    val df = Seq(("a", "hello"), ("b", "hallo")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      EdJoin.edJoin(df, 1)
    }
    assert(e.getMessage.contains("must be numeric"))
  }

  test("driver-side deletion-key hashes match the Column form exactly") {
    // the parity contract behind InvertedIndex.suggestTerms' zero-job
    // bucket pruning: keys computed on the driver MUST land in the
    // partitions the Column expression wrote. Covers ASCII, accented
    // BMP, CJK, and a supplementary code point (emoji) — Spark's substr
    // counts code points, so a UTF-16 code-unit mirror would split the
    // surrogate pair and hash a different variant set.
    val samples = Seq("spark", "a", "", "café", "日本語",
      "ab😀cd", "xx")
    val viaColumn = samples.toDF("s")
      .select(col("s"), EdJoin.deletionKeys(col("s")).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    samples.foreach { s =>
      assert(EdJoin.deletionKeyHashes(s) == viaColumn(s),
        s"driver/Column key mismatch for '$s'")
    }
  }

  test("plan never builds a cartesian product") {
    val names = Tables.customer(spark, sf01)
      .filter($"c_custkey" < 300)
      .select($"c_custkey".as("id"), $"c_name".as("s"))
    val plan = EdJoin.edJoin(names, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"ed-join fell back to a cross product:\n$plan")
  }
}
