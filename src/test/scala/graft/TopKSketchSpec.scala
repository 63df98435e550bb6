package graft

import graft.operators.TopKSketch
import org.apache.spark.sql.functions._

class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  private def flatten(row: org.apache.spark.sql.Row): Seq[(String, Long, Long)] =
    row.getSeq[org.apache.spark.sql.Row](0).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))

  test("SpaceSaving top-k: heavy hitters survive adversarial partitioning with valid bounds") {
    val heavy = Seq("h0" -> 2000, "h1" -> 1000, "h2" -> 600, "h3" -> 400, "h4" -> 300)
    val tail = (0 until 5000).map(i => s"t$i" -> (1 + i % 2))
    val rows = (heavy ++ tail).flatMap { case (k, n) => Seq.fill(n)(k) }
    // deterministic scramble so heavy keys interleave with tail across
    // partitions and merges see them in unfriendly orders
    val df = rows.sortBy(s => (s.hashCode * 2654435761L) & 0xFFFFFFFFL)
      .toDF("w").repartition(7)
    val out = flatten(df.agg(TopKSketch.topK(col("w"), k = 10, capacity = 64)).head())
    val trueCounts = (heavy ++ tail).toMap
    // every heavy hitter is reported, in order, ahead of any tail key
    assert(out.take(5).map(_._1) == heavy.map(_._1), s"got ${out.take(5)}")
    // SpaceSaving bounds: true ≤ est, est − err ≤ true
    out.foreach { case (item, est, err) =>
      val t = trueCounts(item).toLong
      assert(est >= t, s"$item est $est < true $t")
      assert(est - err <= t, s"$item lower bound ${est - err} > true $t")
    }
  }

  test("merge preserves est >= true for items evicted from one partial") {
    // the advisor's counterexample, constructed deterministically at cap=2:
    // A's stream is x,x,x,t0,t1,t2,t3,t4 — the tail churn ratchets the min
    // counter past 3 and recycles x's counter at t4 — while B's stream is
    // five more x. A sum-matched-only merge reports x as est 5 < true 8;
    // charging
    // the absent side's min counter keeps the one-sided bound.
    val cap = 2
    val aStream = Seq.fill(3)("x") ++ (0 to 4).map(i => s"t$i")
    val bStream = Seq.fill(5)("x")
    val a = aStream.foldLeft(Map.empty: TopKSketch.Buf)(TopKSketch.ssInsert(_, _, cap))
    val b = bStream.foldLeft(Map.empty: TopKSketch.Buf)(TopKSketch.ssInsert(_, _, cap))
    assert(!a.contains("x"), s"construction failed: x not evicted from A ($a)")
    val merged = TopKSketch.ssMerge(a, b, cap)
    val trueCounts = (aStream ++ bStream).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    assert(merged.contains("x"), s"heavy item lost in merge ($merged)")
    merged.foreach { case (item, (est, err)) =>
      val t = trueCounts(item)
      assert(est >= t, s"$item est $est < true $t")
      assert(est - err <= t, s"$item lower bound ${est - err} > true $t")
    }
  }

  test("SpaceSaving is exact when capacity covers the key space") {
    val df = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val out = flatten(df.toDF("w").repartition(3)
      .agg(TopKSketch.topK(col("w"), k = 3, capacity = 16)).head())
    assert(out == Seq(("a", 30L, 0L), ("b", 20L, 0L), ("c", 10L, 0L)))
  }

  test("streaming heavy hitters: shard snapshots across micro-batches match batch counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val query = graft.streaming.StreamingTopK.heavyHitters(
        stream.toDF().toDF("w"), k = 10, capacity = 64, nShards = 4)
      .writeStream.format("memory").queryName("topk_test")
      .outputMode("append").start()
    try {
      stream.addData(Seq.fill(30)("a") ++ Seq.fill(5)("b"): _*)
      query.processAllAvailable()
      stream.addData(Seq.fill(20)("a") ++ Seq.fill(25)("c"): _*)
      query.processAllAvailable()
      // last snapshot per (shard, item): capacity covers the vocabulary, so
      // counts are exact over the whole stream and shards never collide on
      // an item (disjoint hash partition of the key space)
      val finals = spark.sql("select * from topk_test").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .groupBy(t => (t._1, t._2))
        .map { case (_, snaps) => snaps.maxBy(_._3) }
      val est = finals.map(t => t._2 -> t._3).toMap
      assert(est == Map("a" -> 50L, "b" -> 5L, "c" -> 25L), s"got $est")
      assert(finals.forall(_._4 == 0L), "exact regime must carry zero error")
    } finally query.stop()
  }

  test("SpaceSaving top words agree with the exact frequency ranking head") {
    val words = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("w"))
    val exact = words.groupBy(col("w")).count()
      .orderBy(col("count").desc, col("w"))
      .limit(5).collect().map(_.getString(0))
    val approx = flatten(
      words.agg(TopKSketch.topK(col("w"), k = 5, capacity = 256)).head())
      .map(_._1)
    // vocabulary at this SF is ~dozens of words, far under capacity → the
    // sketch is exact and the heads must match including order
    assert(approx == exact.toSeq, s"approx $approx vs exact ${exact.toSeq}")
  }
}
