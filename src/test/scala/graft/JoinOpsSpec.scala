package graft

import graft.operators.{AsofJoin, SimilaritySearch}
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("asofJoin: latest right row at-or-before each left row per key") {
    val trades = Seq(
      (1L, ts(5), "t1"), (1L, ts(20), "t2"), (2L, ts(10), "t3"), (3L, ts(1), "t4"))
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, ts(3), 100.0), (1L, ts(5), 101.0), (1L, ts(15), 102.0),
      (2L, ts(12), 200.0))
      .toDF("k", "ts", "price")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("k"), "ts")
      .collect().map(r => r.getAs[String]("trade") ->
        Option(r.getAs[java.lang.Double]("asof_price")).map(_.toDouble)).toMap
    assert(out("t1").contains(101.0)) // equal ts matches (inclusive)
    assert(out("t2").contains(102.0)) // latest preceding
    assert(out("t3").isEmpty)         // right ts after left → no match
    assert(out("t4").isEmpty)         // key with no right rows
  }

  test("asofJoin agrees with a per-row driver-side computation on events") {
    val ev = Tables.events(spark, sf001)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts").limit(50)
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("vid"))
    val got = AsofJoin.asofJoin(purchases, views, Seq("user_id"), "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.getAs[java.lang.Long]("asof_vid"))).toMap
    val allViews = views.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    purchases.collect().foreach { p =>
      val expected = allViews
        .filter(v => v._1 == p.getLong(0) && !v._2.after(p.getTimestamp(2)))
        .sortBy(v => (v._2.getTime, v._3)).lastOption.map(_._3)
      assert(got((p.getLong(0), p.getLong(1))).map(_.toLong) == expected,
        s"user ${p.getLong(0)} purchase ${p.getLong(1)}")
    }
  }

  test("IVF top-k: good recall vs brute force, deterministic") {
    val emb = Tables.embeddings(spark, sf001).cache()
    val queries = emb.filter($"vec_id" < 10)
    val exact = SimilaritySearch.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SimilaritySearch.ivfTopK(emb, queries, k = 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
    val again = SimilaritySearch.ivfTopK(emb, queries, k = 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf == again, "IVF not deterministic")
  }

  test("IVF probe over a prebuilt index equals the one-shot build+probe") {
    val emb = Tables.embeddings(spark, sf001).cache()
    val queries = emb.filter($"vec_id" < 10)
    val oneShot = SimilaritySearch.ivfTopK(emb, queries, k = 5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val index = SimilaritySearch.buildIvfIndex(emb, nlist = 8)
    try {
      val probe1 = SimilaritySearch.ivfProbe(index, queries, k = 5, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val probe2 = SimilaritySearch.ivfProbe(index, queries, k = 5, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(probe1 == oneShot, "prebuilt-index probe diverges from one-shot ivfTopK")
      assert(probe1 == probe2, "repeated probes over one index diverge")
    } finally index.unpersist()
  }

  test("bucketed tables join without an exchange") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val o = Tables.orders(spark, sf001)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", 4)
    // at sf0.001 the planner prefers broadcast (which also skips bucketing);
    // disable it to surface the co-located sort-merge path the layout buys
    // at fact×fact scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and the result matches the plain join
      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("PIT feature join is leakage-safe: snapshots exclude the event's own day") {
    val out = SparkEntry.queries("e_pit_feature_join")(spark, sf001).collect()
    assert(out.nonEmpty)
    val events = Tables.events(spark, sf001)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    def dayOf(t: java.sql.Timestamp) = t.toInstant.truncatedTo(
      java.time.temporal.ChronoUnit.DAYS)
    var checked = 0
    out.take(200).foreach { r =>
      val u = r.getAs[Long]("user_id")
      val ts = r.getAs[java.sql.Timestamp]("ts")
      val expected = events.count { case (eu, et) =>
        eu == u && dayOf(et).isBefore(dayOf(ts))
      }
      val got = if (r.isNullAt(r.fieldIndex("events_to_date"))) 0L
        else r.getAs[Long]("events_to_date")
      assert(got == expected.toLong,
        s"user $u at $ts: features=$got, strictly-prior-day events=$expected")
      checked += 1
    }
    assert(checked > 0)
  }
}
