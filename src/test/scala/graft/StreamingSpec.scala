package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming correctness (SURVEY.md §7.3 streaming state): drive
  * the same transforms EventQueries oracle-checks in batch through
  * MemoryStream micro-batches, including manufactured late events beyond the
  * watermark.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming quality flags: stateless scoring equals batch under any batching") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingQuality
    val w = Map("good" -> 0.5, "fine" -> 0.2, "bad" -> -0.9)
    val rows = Seq(
      (1L, "a", "good fine good"), (2L, "a", "bad bad good"),
      (3L, "b", "fine"), (4L, "b", "unknown words only"),
      (5L, "a", ""), (6L, "b", "good bad")) // 0.5-0.9: negative
    val stream = MemoryStream[(Long, String, String)]
    val q = StreamingQuality.scoreFlags(
        stream.toDF().toDF("doc_id", "source", "text"), w)
      .select(col("doc_id"), col("pred_keep"))
      .writeStream.format("memory").queryName("quality_stream")
      .outputMode("append").start()
    try {
      rows.grouped(2).foreach { g =>
        stream.addData(g: _*); q.processAllAvailable()
      }
      val streamed = spark.table("quality_stream").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
      val batch = StreamingQuality.scoreFlags(
          rows.toDF("doc_id", "source", "text"), w)
        .select(col("doc_id"), col("pred_keep")).collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
      assert(streamed == batch)
      assert(streamed == Seq(1L -> true, 2L -> false, 3L -> true,
        4L -> false, 5L -> false, 6L -> false))
    } finally q.stop()
  }

  test("tumbling window counts across micro-batches with late-event drop") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.tumblingCounts(events, "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(1), 1L, "click", 1.0), (2L, ts(5), 1L, "click", 2.0))
      query.processAllAvailable()
      // advance watermark far past the first window → closes it
      stream.addData((3L, ts(55), 2L, "view", 1.0))
      query.processAllAvailable()
      // late event for the long-closed first window → dropped
      stream.addData((4L, ts(2), 3L, "click", 99.0))
      query.processAllAvailable()
      stream.addData((5L, ts(59), 2L, "view", 1.0))
      query.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select(col("bucket_start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((Timestamp.valueOf("2026-01-01 10:00:00"), "click", 2L)),
        s"closed window wrong: $rows")
      assert(!rows.exists { case (w, t, n) =>
        w == Timestamp.valueOf("2026-01-01 10:00:00") && t == "click" && n != 2L
      }, "late event leaked into closed window")
    } finally query.stop()
  }

  test("streaming transforms match batch execution on the same data") {
    val batch = Tables.events(spark, sf001)
    val batchResult = EventStreams.tumblingCounts(batch)
      .orderBy("bucket_start", "event_type").collect()
    assert(batchResult.nonEmpty)
    // same plan works in both modes; batch path already oracle-checked
    // (e_tumbling_10min) — here we assert the streaming-surface function is
    // the one producing it.
    val direct = batch
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("bucket_start", "event_type").collect()
    assert(batchResult.toSeq == direct.toSeq)
  }

  test("session windows merge events within gap, split across it") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.sessionCounts(events, "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then 25 min gap (new session)
      stream.addData((1L, ts(0), 1L, "a", 1.0), (2L, ts(5), 1L, "a", 1.0),
        (3L, ts(30), 1L, "a", 1.0))
      query.processAllAvailable()
      stream.addData((9L, Timestamp.valueOf("2026-01-01 12:00:00"), 2L, "a", 1.0))
      query.processAllAvailable()
      val rows = spark.table("session_test")
        .filter(col("user_id") === 1L)
        .select(col("session_start"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      assert(rows == Set(
        (Timestamp.valueOf("2026-01-01 10:00:00"), 2L),
        (Timestamp.valueOf("2026-01-01 10:30:00"), 1L)), s"sessions: $rows")
    } finally query.stop()
  }

  test("stream-stream interval join pairs events within the bound only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val views = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def df(s: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
      s.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.intervalJoin(df(clicks), df(views), "15 minutes")
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    try {
      views.addData((100L, ts(0), 1L, "view", 1.0), (101L, ts(50), 1L, "view", 1.0),
        (102L, ts(5), 2L, "view", 1.0))
      clicks.addData((200L, ts(10), 1L, "click", 1.0), (201L, ts(55), 1L, "click", 1.0))
      query.processAllAvailable()
      val pairs = spark.table("ssjoin_test")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // click@10 pairs with view@0 (within 15m); click@55 with view@50;
      // click@10 must NOT pair with view@50 (future) or user 2's view
      assert(pairs == Set((200L, 100L), (201L, 101L)), s"pairs: $pairs")
    } finally query.stop()
  }

  test("stream-static enrichment joins the dimension without streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dim = Seq(("click", "interaction"), ("view", "impression"))
      .toDF("event_type", "category")
    val query = EventStreams.enrich(events, dim, "event_type")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(0), 1L, "click", 1.0), (2L, ts(1), 1L, "purchase", 1.0))
      query.processAllAvailable()
      val out = spark.table("enrich_test")
        .select("event_id", "category").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(out(1L).contains("interaction"))
      assert(out(2L).isEmpty) // left join keeps unmatched stream rows
    } finally query.stop()
  }

  test("sliding windows: each event lands in width/slide overlapping buckets") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.slidingCounts(events, "10 minutes", "5 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(7), 1L, "click", 1.0))
      query.processAllAvailable()
      stream.addData((2L, ts(59), 2L, "view", 1.0)) // close the early windows
      query.processAllAvailable()
      val rows = spark.table("sliding_test")
        .filter(col("event_type") === "click")
        .collect().map(r => r.getTimestamp(0)).toSet
      // event at 10:07 belongs to [10:00,10:10) and [10:05,10:15)
      assert(rows == Set(
        Timestamp.valueOf("2026-01-01 10:00:00"),
        Timestamp.valueOf("2026-01-01 10:05:00")), s"buckets: $rows")
    } finally query.stop()
  }

  test("parquet sink: windowed aggregate lands in files with checkpointing") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val outDir = java.nio.file.Files.createTempDirectory("sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString
    val query = EventStreams.toParquetSink(
      EventStreams.tumblingCounts(events, "10 minutes", "30 minutes"),
      outDir, ckpt)
    try {
      stream.addData((1L, ts(1), 1L, "click", 1.0), (2L, ts(5), 1L, "click", 2.0))
      query.processAllAvailable()
      stream.addData((3L, ts(55), 2L, "view", 1.0)) // advances watermark, closes window
      query.processAllAvailable()
      val written = spark.read.parquet(outDir)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(written.contains((Timestamp.valueOf("2026-01-01 10:00:00"), "click", 2L)),
        s"sink contents: ${written.mkString(",")}")
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionize: gap split, event-time timeout close") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.statefulSessionize(events, gapMinutes = 30, "10 minutes")
      .writeStream.format("memory").queryName("stateful_session_test")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00, 10:05 (one session), then 11:00 (> 30 min
      // gap → closes the first session immediately on arrival)
      stream.addData((1L, ts(0), 1L, "a", 1.0), (2L, ts(5), 1L, "a", 2.0))
      query.processAllAvailable()
      stream.addData((3L, Timestamp.valueOf("2026-01-01 11:00:00"), 1L, "a", 4.0))
      query.processAllAvailable()
      val afterGap = spark.table("stateful_session_test")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(afterGap == Set((1L, ts(0), ts(5), 2L, 3.0)), s"sessions: $afterGap")
      ()
      // another user far in the future advances the watermark past
      // 11:00 + 30 min → the open session closes by event-time TIMEOUT,
      // with no further user-1 events
      stream.addData((4L, Timestamp.valueOf("2026-01-01 13:00:00"), 2L, "a", 1.0))
      query.processAllAvailable()
      stream.addData((5L, Timestamp.valueOf("2026-01-01 13:01:00"), 2L, "a", 1.0))
      query.processAllAvailable()
      val afterTimeout = spark.table("stateful_session_test")
        .filter(col("user_id") === 1L)
        .collect().map(r => (r.getTimestamp(1), r.getLong(3))).toSet
      assert(afterTimeout == Set(
        (ts(0), 2L),
        (Timestamp.valueOf("2026-01-01 11:00:00"), 1L)), s"sessions: $afterTimeout")
    } finally query.stop()
  }

  test("stateful sessionize matches the batch gap construction on real data") {
    // batch mode: flatMapGroupsWithState runs as a single-pass mapGroups —
    // sessions must equal the oracle-checked lag+cumsum construction
    // (e_sessionize_30min_gap) in count and membership
    def us(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000L
    val events = Tables.events(spark, sf001)
    val stateful = EventStreams.statefulSessionize(events, 30)
      .collect().map(s => (s.user_id,
        s.session_start.getEpochSecond * 1000000L + s.session_start.getNano / 1000L,
        s.n_events)).toSet
    val batchRows = SparkEntry.queries("e_sessionize_30min_gap")(spark, sf001)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2)))
    // batch execution runs each group once and never fires timeouts, so the
    // trailing (still-open) session of every user is NOT emitted — expected
    // = the oracle-checked construction minus each user's last session
    val expected = batchRows.groupBy(_._1).values.flatMap { ss =>
      ss.sortBy(_._2).dropRight(1)
    }.toSet
    assert(stateful == expected,
      s"stateful-only: ${(stateful -- expected).take(3)}; expected-only: ${(expected -- stateful).take(3)}")
  }

  test("streaming minhash near-dup hits: exact dup flagged on every band") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val query = graft.streaming.StreamingDedup.nearDupHits(docs)
      .writeStream.format("memory").queryName("sdedup_test")
      .outputMode("append").start()
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "a completely different document about spark shuffle partitions and joins"
    try {
      stream.addData((1L, textA), (2L, textB))
      query.processAllAvailable()
      assert(spark.table("sdedup_test").count() == 0, "distinct docs produced hits")
      // exact duplicate of doc 1 arrives later: identical signature → all
      // 8 band buckets already claimed by doc 1
      stream.addData((3L, textA))
      query.processAllAvailable()
      val hits = spark.table("sdedup_test")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(hits.length == 8, s"expected 8 band hits, got ${hits.toSeq}")
      assert(hits.forall(h => h._1 == 3L && h._3 == 1L), s"hits: ${hits.toSeq}")
    } finally query.stop()
  }

  test("streaming near-dup hits match the batch candidate generator") {
    implicit val sqlCtx = spark.sqlContext
    // feed real documents in doc_id order; a doc gets a streaming hit iff
    // the batch banding pairs it with some LOWER-id doc — i.e. it appears
    // as id_b in minhashCandidates (same signatures, same band layout)
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingDedup
      .nearDupHits(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sdedup_batch_parity")
      .outputMode("append").start()
    try {
      val (firstHalf, secondHalf) = docs.splitAt(docs.length / 2)
      stream.addData(firstHalf.toSeq)
      query.processAllAvailable()
      stream.addData(secondHalf.toSeq)
      query.processAllAvailable()
      val streamed = spark.table("sdedup_batch_parity")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val batchPairs = graft.operators.Dedup.minhashCandidates(
          graft.operators.Dedup.minhashSignatures(
            Tables.documents(spark, sf001)),
          maxBucketSize = Int.MaxValue)
        .select(col("id_b")).collect().map(_.getLong(0)).toSet
      assert(streamed == batchPairs,
        s"stream-only: ${(streamed -- batchPairs).take(5)}; batch-only: ${(batchPairs -- streamed).take(5)}")
    } finally query.stop()
  }

  test("streaming vector near-dup: exact dup all bands, perturbed collides, distinct silent") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val vecs = stream.toDF().toDF("vec_id", "embedding")
    val query = graft.streaming.StreamingVecDedup.nearDupHits(vecs)
      .writeStream.format("memory").queryName("svdedup_test")
      .outputMode("append").start()
    // deterministic base vector; near = one dim nudged (sign pattern
    // unchanged → same sketch); far = alternating-sign (orthogonal-ish)
    val base = Array.tabulate(64)(i => (math.sin(i * 1.7) * 0.5).toFloat).toSeq
    val near = base.updated(5, base(5) + 1e-4f)
    val far = Array.tabulate(64)(i =>
      (math.cos(i * 2.3) * (if (i % 2 == 0) 0.5 else -0.5)).toFloat).toSeq
    try {
      stream.addData((1L, base), (4L, far))
      query.processAllAvailable()
      assert(spark.table("svdedup_test").count() == 0, "distinct vectors produced hits")
      stream.addData((2L, base), (3L, near))
      query.processAllAvailable()
      val hits = spark.table("svdedup_test")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      // exact re-delivery collides on all 8 bands, claimed by id 1
      val exact = hits.filter(_._1 == 2L)
      assert(exact.length == 8, s"expected 8 band hits for the exact dup: ${hits.toSeq}")
      assert(exact.forall(_._3 == 1L), s"hits: ${exact.toSeq}")
      // tiny perturbation keeps every projection sign → also full collision
      val nearHits = hits.filter(_._1 == 3L)
      assert(nearHits.length == 8 && nearHits.forall(_._3 == 1L),
        s"near-dup hits: ${nearHits.toSeq}")
      assert(!hits.exists(_._1 == 4L), "distinct vector flagged")
    } finally query.stop()
  }

  test("streaming dedup drops duplicate event ids within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.dedupEvents(events, "1 hour")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(0), 1L, "a", 1.0), (1L, ts(1), 1L, "a", 1.0),
        (2L, ts(2), 1L, "b", 1.0))
      query.processAllAvailable()
      stream.addData((1L, ts(3), 1L, "a", 1.0), (3L, ts(4), 1L, "c", 1.0))
      query.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L), s"ids: $ids")
    } finally query.stop()
  }

  test("streaming chunk dedup: shared passages hit, claims stay with the first batch") {
    implicit val sqlCtx = spark.sqlContext
    // all-distinct tokens: no intra-document duplicate chunks, so the only
    // hits are genuine cross-document passage repeats. Short chunks
    // (mod 4, len 4-8) make boundaries overwhelmingly content-defined, so
    // the two docs' passage chunks resynchronize despite different prefixes
    val passage = (0 until 40).map(i => s"p$i").mkString(" ")
    val unique1 = (0 until 20).map(i => s"a$i").mkString(" ")
    val unique2 = (0 until 20).map(i => s"b$i").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingChunkDedup.chunkDupHits(
        stream.toDF().toDF("doc_id", "text"),
        modulus = 4, minLen = 4, maxLen = 8)
      .writeStream.format("memory").queryName("schunk_test")
      .outputMode("append").start()
    try {
      stream.addData((1L, unique1 + " " + passage))
      query.processAllAvailable()
      assert(spark.table("schunk_test").count() == 0,
        "first ingest produced hits")
      // a later doc repeating the passage (after different leading content)
      // must collide on the passage's content-defined chunks, owned by doc 1
      stream.addData((2L, unique2 + " " + passage))
      query.processAllAvailable()
      val hits = spark.table("schunk_test")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(hits.nonEmpty, "shared passage not detected across batches")
      assert(hits.forall { case (d, o) => d == 2L && o == 1L }, s"hits: ${hits.toSeq}")
      // re-ingesting doc 1 verbatim: every chunk repeats history, all owned
      // by the original claim (stability), none self-owned
      stream.addData((3L, unique1 + " " + passage))
      query.processAllAvailable()
      val later = spark.table("schunk_test")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .filter(_._1 == 3L)
      assert(later.nonEmpty && later.forall(_._2 == 1L), s"later: ${later.toSeq}")
    } finally query.stop()
  }

  test("streaming span dedup matches the batch operator under ascending arrival") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).take(120)
    val stream = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingSpanDedup.spanClaims(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sspan_test")
      .outputMode("append").start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val got = spark.table("sspan_test")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
      val batch = graft.operators.Dedup.spanDedup(
          Tables.documents(spark, sf001).filter($"doc_id".isin(docs.map(_._1): _*)))
        .select("doc_id", "n_segs", "n_kept").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // per-doc span and kept counts agree with the batch operator
      val gotPerDoc = got.groupBy(_._1).map { case (d, s) =>
        d -> ((s.size.toLong, s.count(_._3).toLong)) }
      assert(gotPerDoc == batch,
        s"stream ${gotPerDoc.take(3)} vs batch ${batch.take(3)}")
      assert(got.exists(!_._3), "no duplicate span detected at this SF")
    } finally query.stop()
  }

  test("streaming span dedup: claims are permanent across batches, min-wins within") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingSpanDedup.spanClaims(
        stream.toDF().toDF("doc_id", "text"), segTokens = 2)
      .writeStream.format("memory").queryName("sspan_edge")
      .outputMode("append").start()
    try {
      // batch 1: docs 5 and 2 share span "a b" → doc 2 (min id) keeps it
      stream.addData((5L, "a b x y"), (2L, "a b u v"))
      query.processAllAvailable()
      // batch 2: doc 1 repeats "a b" → dropped though 1 < 2 (permanent claim)
      stream.addData((1L, "a b q r"))
      query.processAllAvailable()
      val kept = spark.table("sspan_edge")
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getBoolean(2))).toMap
      assert(kept((2L, 0)) && !kept((5L, 0)) && !kept((1L, 0)),
        s"span 'a b' claims wrong: $kept")
      // every doc's unique tail span is kept
      assert(kept((5L, 1)) && kept((2L, 1)) && kept((1L, 1)))
    } finally query.stop()
  }

  test("ttl dedup: dup within retention, re-claimed after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    // ttl = 10 min, watermark delay 0 so the horizon advances immediately
    val query = graft.streaming.StreamingTtlDedup.dupVerdicts(
        stream.toDF().toDF("doc_id", "text", "ts"),
        ttlMs = 10 * 60 * 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ttl_dedup_test")
      .outputMode("append").start()
    try {
      // t=1: first claim; t=5: same content inside ttl → dup
      stream.addData((1L, "same text", ts(1)), (2L, "same text", ts(5)))
      query.processAllAvailable()
      // t=20: claim (from t=1) expired at t=11 → content kept AGAIN
      // t=25: inside the NEW claim's ttl → dup
      stream.addData((3L, "same text", ts(20)), (4L, "same text", ts(25)))
      query.processAllAvailable()
      // distinct content is never a dup regardless of timing
      stream.addData((5L, "other text", ts(26)))
      query.processAllAvailable()
      val got = spark.table("ttl_dedup_test")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
        5L -> false), s"verdicts wrong: $got")
    } finally query.stop()
  }

  test("ttl dedup: in-batch ties resolve by (event time, id) deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val query = graft.streaming.StreamingTtlDedup.dupVerdicts(
        stream.toDF().toDF("doc_id", "text", "ts"),
        ttlMs = 60 * 60 * 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ttl_dedup_ties")
      .outputMode("append").start()
    try {
      // same batch, same content, same timestamp: lowest doc id claims;
      // a later-timestamped row in the same batch is a dup of that claim
      stream.addData((9L, "x y", ts(3)), (4L, "x y", ts(3)), (7L, "x y", ts(8)))
      query.processAllAvailable()
      val got = spark.table("ttl_dedup_ties")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got == Map(4L -> false, 9L -> true, 7L -> true),
        s"tie resolution wrong: $got")
    } finally query.stop()
  }

  test("streaming CMS: final shard union is bit-identical to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val words = Tables.documents(spark, sf001).limit(200)
      .select(explode(split($"text", " ")).as("w")).as[String].collect()
    val stream = MemoryStream[String]
    val query = graft.streaming.StreamingCms.pointCounts(
        stream.toDF().toDF("w"), d = 4, w = 256, nShards = 4)
      .writeStream.format("memory").queryName("cms_stream_test")
      .outputMode("append").start()
    try {
      words.grouped((words.length + 2) / 3).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      // latest snapshot per shard, summed elementwise
      import org.apache.spark.sql.expressions.Window
      val latest = spark.table("cms_stream_test")
        .withColumn("rn", monotonically_increasing_id())
        .withColumn("last", max($"rn").over(Window.partitionBy($"shard")))
        .filter($"rn" === $"last")
        .select($"table").collect().map(_.getSeq[Long](0))
      val unioned = latest.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      val batch = Tables.documents(spark, sf001).limit(200)
        .select(explode(split($"text", " ")).as("w"))
        .agg(graft.operators.CmsSketch.sketch($"w", 4, 256))
        .collect()(0).getSeq[Long](0)
      assert(unioned == batch,
        "streaming shard union diverged from the batch sketch")
    } finally query.stop()
  }

  test("ttl near-dup: bucket hits inside retention, fresh claims after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val body = "the quick brown fox jumps over the lazy dog again and again"
    val query = graft.streaming.StreamingDedup.nearDupHitsTtl(
        stream.toDF().toDF("doc_id", "text", "ts"),
        ttlMs = 10 * 60 * 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("ttl_neardup_test")
      .outputMode("append").start()
    try {
      // identical text = identical signature = all 8 band buckets shared.
      // t=1 claims; t=5 inside ttl → 8 hits against doc 1
      stream.addData((1L, body, ts(1)), (2L, body, ts(5)))
      query.processAllAvailable()
      // t=20: every claim (from t=1) expired at t=11 → doc 3 claims fresh,
      // NO hits; t=25 inside doc 3's ttl → 8 hits against doc 3
      stream.addData((3L, body, ts(20)))
      query.processAllAvailable()
      stream.addData((4L, body, ts(25)))
      query.processAllAvailable()
      val hits = spark.table("ttl_neardup_test")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val byDoc = hits.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(byDoc.get(2L).contains(Set(1L)) && hits.count(_._1 == 2L) == 8,
        s"doc 2 should hit doc 1 on all 8 bands: ${byDoc.get(2L)}")
      assert(!byDoc.contains(3L), s"doc 3 arrived past ttl, must claim fresh: $byDoc")
      assert(byDoc.get(4L).contains(Set(3L)),
        s"doc 4 should hit the NEW claimant doc 3: ${byDoc.get(4L)}")
    } finally query.stop()
  }

  test("streaming weighted sample: final snapshot equals the batch draw, any batching") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2).toDouble))
    val stream = MemoryStream[(String, Long, Double)]
    val query = graft.streaming.StreamingSampling.weightedKSample(
        stream.toDF().toDF("source", "doc_id", "weight"), k = 5)
      .writeStream.format("memory").queryName("swsample_test")
      .outputMode("append").start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val finals = spark.table("swsample_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        .groupBy(_._1).map { case (g, snaps) => g -> snaps.maxBy(_._2)._3 }
      val batch = Tables.documents(spark, sf001)
        .groupBy(col("source"))
        .agg(graft.operators.Sampling
          .weightedK(col("doc_id"), col("n_chars"), 5).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(finals == batch)
    } finally query.stop()
  }

  test("streaming bottom-k sample: final snapshot equals the batch draw, any batching") {
    implicit val sqlCtx = spark.sqlContext
    // real documents split into three arbitrary micro-batches: the merged
    // stream sample must be BIT-identical to the batch Aggregator's draw
    // (the mergeable-sketch property — arrival order never biases it)
    val docs = Tables.documents(spark, sf001)
      .select(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val stream = MemoryStream[(String, Long)]
    val query = graft.streaming.StreamingSampling.bottomKSample(
        stream.toDF().toDF("source", "doc_id"), k = 7)
      .writeStream.format("memory").queryName("ssample_test")
      .outputMode("append").start()
    try {
      val thirds = docs.grouped((docs.length + 2) / 3).toSeq
      thirds.foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      // keep the max-seq snapshot per group
      val finals = spark.table("ssample_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        .groupBy(_._1).map { case (g, snaps) => g -> snaps.maxBy(_._2)._3 }
      val batch = Tables.documents(spark, sf001)
        .groupBy(col("source"))
        .agg(graft.operators.Sampling.bottomK(col("doc_id"), 7).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(finals == batch,
        s"stream ${finals.toSeq.sortBy(_._1).take(3)} vs batch ${batch.toSeq.sortBy(_._1).take(3)}")
    } finally query.stop()
  }

  test("streaming curation pipeline matches batch rules+redact+dedup, any batching") {
    implicit val sqlCtx = spark.sqlContext
    // real documents in doc_id order across three micro-batches: survivors
    // must equal the batch pipeline's stage-3 set (min doc_id per redacted
    // content among rule-passers) — ordered arrival makes first-wins and
    // min-id coincide
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stream = MemoryStream[(Long, String, String)]
    val query = graft.streaming.StreamingCuration.cleanStream(
        stream.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("scur_test")
      .outputMode("append").start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      val got = spark.table("scur_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      val want = graft.SparkEntry.queries("tx_stream_curation_clean")(spark, sf001)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"stream ${got.take(5)}... vs batch ${want.take(5)}...")
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("streaming curation: later duplicate dropped, intra-batch dup resolves to min id") {
    implicit val sqlCtx = spark.sqlContext
    // rule-passing text: 40 words, 2 stopwords, all bigrams distinct (a
    // repeated filler phrase would trip the duplication-fraction rule)
    val good = ("the" +: "and" +: (1 to 38).map(i => s"wx$i")).mkString(" ")
    val stream = MemoryStream[(Long, String, String)]
    val query = graft.streaming.StreamingCuration.cleanStream(
        stream.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("scur_edge")
      .outputMode("append").start()
    try {
      // batch 1: ids 5 and 2 carry identical content → min id 2 survives
      stream.addData((5L, "s", good), (2L, "s", good))
      query.processAllAvailable()
      // batch 2: id 1 repeats the content → dropped (claim is permanent,
      // even though 1 < 2)
      stream.addData((1L, "s", good))
      query.processAllAvailable()
      val ids = spark.table("scur_edge").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(2L), s"ids: $ids")
    } finally query.stop()
  }

  test("checkpoint restart: dedup bucket claims survive a stop/start") {
    // the GroupState twins claim their state lives in the (RocksDB) state
    // store at scale — prove the recovery half: stop a query, restart it
    // from its checkpoint, and the claims made before the stop must govern
    // documents arriving after it
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-dedup")
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    def start() = graft.streaming.StreamingDedup.nearDupHits(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      stream.addData((1L, text), (2L, text))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      stream.addData((3L, text))
      q2.processAllAvailable()
    } finally q2.stop()
    val byDoc = spark.read.parquet(out)
      .select(col("doc_id"), col("band"), col("first_doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    assert(byDoc.get(2L).exists(h => h.length == 8 && h.forall(_._3 == 1L)),
      s"pre-stop dup not flagged on all bands: $byDoc")
    // the discriminating assertion: had state been lost at restart, doc 3
    // would have claimed every bucket fresh and emitted NO hits
    assert(byDoc.get(3L).exists(h => h.length == 8 && h.forall(_._3 == 1L)),
      s"claims did not survive restart: $byDoc")
    assert(!byDoc.contains(1L), "first claimant must never be flagged")
  }

  test("checkpoint restart: bottom-k sample continues the identical draw") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-sample")
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[(String, Long)]
    def start() = graft.streaming.StreamingSampling.bottomKSample(
        stream.toDF().toDF("source", "doc_id"), k = 7)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      stream.addData((1L to 30L).map(("s", _)))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      stream.addData((31L to 60L).map(("s", _)))
      q2.processAllAvailable()
    } finally q2.stop()
    val finalSample = spark.read.parquet(out)
      .collect().map(r => (r.getLong(1), r.getSeq[Long](2)))
      .maxBy(_._1)
    // seq advanced across the restart (state counter restored), and the
    // final snapshot is bit-identical to folding ALL ids through the
    // mergeable buffer — the restart is invisible to the draw
    assert(finalSample._1 == 2L, s"seq after restart: ${finalSample._1}")
    val expected = (1L to 60L).foldLeft(Vector.empty: graft.operators.Sampling.Buf)(
      graft.operators.Sampling.insert(_, _, 7)).map(_._2)
    assert(finalSample._2 == expected,
      s"draw changed across restart: ${finalSample._2} vs $expected")
  }

  test("streaming span decontamination: stateless scrub identical across any batching") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "b", "the secret eval answer key five")).toDF("doc_id", "source", "text")
    val grams = graft.operators.Dedup.benchmarkGrams(bench, n = 5)
      .select($"__gram".as("gram"))
    val d1 = (1L, "s", "prefix the secret eval answer key five suffix")
    val d2 = (2L, "s", "clean document with no benchmark text inside here")
    val d3 = (3L, "s", "the secret eval answer key five")
    val stream = MemoryStream[(Long, String, String)]
    val docs = stream.toDF().toDF("doc_id", "source", "text")
    val q = graft.streaming.StreamingDecontaminate.scrubStream(docs, grams, 5)
      .writeStream.format("memory").queryName("decon_test")
      .outputMode("append").start()
    try {
      stream.addData(d1)
      q.processAllAvailable()
      stream.addData(d2, d3)
      q.processAllAvailable()
      val out = spark.table("decon_test").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("text"), r.getAs[Long]("n_tokens_removed"))).toMap
      assert(out(1L) == ("prefix suffix", 6L))
      assert(out(2L)._2 == 0L)
      assert(out(3L) == ("", 6L))
      // batch mode produces the identical relation — stateless by design
      val batch = graft.streaming.StreamingDecontaminate.scrubStream(
        Seq(d1, d2, d3).toDF("doc_id", "source", "text"), grams, 5)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("text"), r.getAs[Long]("n_tokens_removed"))).toMap
      assert(batch == out)
    } finally q.stop()
  }
}
