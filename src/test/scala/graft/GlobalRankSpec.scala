package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must be bit-for-bit NTILE/rank, just without the
  * one-partition window (the round-1 scale-killer). Parity is asserted
  * against Spark's own window functions on inputs spanning every n % k
  * residue, including n < k and duplicate order values broken by a key.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf(n: Int) = {
    val rng = new scala.util.Random(7)
    (1 to n).map(i => (i.toLong, rng.nextInt(50).toDouble)).toDF("id", "v")
      .repartition(4) // scatter input so ranks must cross partitions
  }

  test("withGlobalRank matches row_number over the total order") {
    val df = mkDf(101)
    val (ranked, n) = GlobalRank.withGlobalRank(df, "r", col("v"), col("id"))
    assert(n == 101)
    val got = ranked.select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val want = df.select(col("id"),
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("NaN first keys rank last, like the window sort order") {
    // Spark sorts NaN greatest; a NaN bucketed to 0 (every bound compare
    // false) would silently misrank as bucket 0's largest element
    val df = ((1 to 50).map(i => (i.toLong, i.toDouble)) ++
      Seq((98L, Double.NaN), (99L, Double.NaN))).toDF("id", "v")
      .repartition(4)
    val (ranked, n) = GlobalRank.withGlobalRank(df, "r", col("v"), col("id"))
    assert(n == 52)
    val got = ranked.select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val want = df.select(col("id"),
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got(98L) == 51L && got(99L) == 52L)
  }

  test("ranks stay exact when bucketing is approximate (large input)") {
    // 20k rows: big enough that boundary estimation is genuinely partial.
    // The repartitionByRange form regressed exactly here — per-job range
    // re-sampling gave the count pass and the join pass different
    // boundaries (sf0.1 oracle caught 14547/15000 drifted ranks)
    val df = mkDf(20000)
    val (ranked, n) = GlobalRank.withGlobalRank(df, "r", col("v"), col("id"))
    assert(n == 20000)
    val got = ranked.select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val want = df.select(col("id"),
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withNtile matches ntile(k) window for every n % k residue") {
    for (n <- Seq(3, 99, 100, 101, 102, 103); k <- Seq(1, 4, 7)) {
      val df = mkDf(n)
      val got = GlobalRank.withNtile(df, k, "t", col("v"), col("id"))
        .select(col("id"), col("t")).as[(Long, Int)].collect().toMap
      val want = df.select(col("id"),
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("withNtileByBoundaries matches ntile(k) window for every n % k residue") {
    // incl. n < k (q = 0: every row its own tile) and k = 1
    for (n <- Seq(3, 99, 100, 101, 102, 103); k <- Seq(1, 4, 7, 128)) {
      val df = mkDf(n).withColumn("vi", col("v").cast("long"))
      val got = GlobalRank.withNtileByBoundaries(df, k, "t", col("vi"), col("id"))
        .select(col("id"), col("t")).as[(Long, Int)].collect().toMap
      val want = df.select(col("id"),
          ntile(k).over(Window.orderBy(col("vi"), col("id"))))
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"boundary-ntile mismatch at n=$n k=$k")
    }
    // map-only output side: the assigned relation adds no shuffle on top
    // of the input (boundaries are closure-captured, not joined)
    val df = mkDf(50).withColumn("vi", col("v").cast("long"))
    val plan = GlobalRank.withNtileByBoundaries(df, 4, "t", col("vi"), col("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"boundary ntile output side must be join-free:\n$plan")
  }

  test("ntile output column is IntegerType (matches window ntile)") {
    val df = mkDf(10)
    val schema = GlobalRank.withNtile(df, 4, "t", col("v"), col("id")).schema
    assert(schema("t").dataType == org.apache.spark.sql.types.IntegerType)
  }

  // group sizes deliberately skewed (incl. a singleton group for the
  // percent_rank n=1 edge) and order values heavily duplicated so groups
  // straddle bucket boundaries mid-tie
  private def mkGrouped(n: Int) = {
    val rng = new scala.util.Random(11)
    ((1 to n).map { i =>
      val g = if (i % 7 == 0) "big" else if (i % 3 == 0) "mid" else "small"
      (i.toLong, g, rng.nextInt(20).toDouble)
    } :+ ((n + 1).toLong, "solo", 5.0)).toDF("id", "g", "v")
      .repartition(4)
  }

  test("withGroupRank matches row_number over the per-group window") {
    for (n <- Seq(40, 2000)) {
      val df = mkGrouped(n)
      val got = GlobalRank.withGroupRank(df, col("g"), "r", "cnt",
          col("v"), col("id"))
        .select(col("id"), col("r"), col("cnt"))
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, (t._2, t._3))).toMap
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val cw = Window.partitionBy(col("g"))
      val want = df.select(col("id"),
          row_number().over(w).cast("long"),
          count(lit(1)).over(cw))
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, (t._2, t._3))).toMap
      assert(got == want, s"group rank mismatch at n=$n")
    }
  }

  test("withGroupRank hostile edges: empty input, one group, one row") {
    // empty: quantile sketch returns no bounds; every stage must pass
    // through to an empty result, not throw
    val empty = mkGrouped(5).filter(col("id") < 0)
    assert(GlobalRank.withGroupRank(empty, col("g"), "r", "cnt",
      col("v"), col("id")).count() == 0L)
    // single row: rank 1, count 1 (the percent_rank n=1 edge upstream)
    val one = Seq((7L, "only", 3.0)).toDF("id", "g", "v")
    val r1 = GlobalRank.withGroupRank(one, col("g"), "r", "cnt",
        col("v"), col("id"))
      .select(col("r"), col("cnt")).as[(Long, Long)].head()
    assert(r1 == ((1L, 1L)))
    // all rows in ONE group with all-equal order keys: ranks must still be
    // a permutation of 1..n (doc-id tiebreak), count constant
    val flat = (1L to 50L).map((_, "g", 1.0)).toDF("id", "g", "v").repartition(4)
    val rs = GlobalRank.withGroupRank(flat, col("g"), "r", "cnt",
        col("v"), col("id"))
      .select(col("id"), col("r"), col("cnt"))
      .as[(Long, Long, Long)].collect()
    assert(rs.map(_._2).sorted.toSeq == (1L to 50L))
    assert(rs.forall(_._3 == 50L))
    assert(rs.sortBy(_._1).map(_._2).toSeq == (1L to 50L),
      "equal keys must rank by the id tiebreak")
  }

  test("withGroupNtile matches ntile(k) over the per-group window") {
    for (n <- Seq(37, 400); k <- Seq(1, 4, 7)) {
      val df = mkGrouped(n)
      val got = GlobalRank.withGroupNtile(df, col("g"), k, "t",
          col("v"), col("id"))
        .select(col("id"), col("t")).as[(Long, Int)].collect().toMap
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val want = df.select(col("id"), ntile(k).over(w))
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"grouped ntile mismatch at n=$n k=$k")
    }
  }

  test("withGroupRank descending order via negation (quality-gate shape)") {
    val df = mkGrouped(300)
    val got = GlobalRank.withGroupRank(df, col("g"), "r", "cnt",
        -col("v"), col("id"))
      .select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df.select(col("id"), row_number().over(w).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
