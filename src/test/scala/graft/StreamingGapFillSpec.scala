package graft

import graft.operators.GapFill
import graft.streaming.StreamingGapFill
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming LOCF grid vs its batch oracle: ticks emit as the watermark
  * passes them, rows at or before the last observation are bit-identical
  * to GapFill.locfGrid, idle keys keep ticking via the event-time
  * timeout, and the batch-twin mode reproduces the batch operator
  * row-for-row.
  */
class StreamingGapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  private def harness(stepSeconds: Long, watermark: String)(
      feed: (MemoryStream[(Long, Timestamp, Double, Long)],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[(Long, Timestamp, Timestamp, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double, Long)]
    val events = stream.toDF().toDF("user_id", "ts", "value", "event_id")
    val name = s"gapfill_test_${System.nanoTime()}"
    val query = StreamingGapFill.locfTicks(events, stepSeconds,
        watermark = watermark)
      .toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      feed(stream, query)
      query.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getDouble(3)))
        .sortBy(t => (t._1, t._2.getTime)).toSeq
    } finally query.stop()
  }

  test("ticks emit exactly when the watermark passes them, values final") {
    // step 1h, watermark 30m. Events: 10:10 v=1, 11:40 v=2 (wm -> 11:10
    // after batch 2: tick 11:00 emits carrying 10:10's value)
    val out = harness(3600L, "30 minutes") { (stream, query) =>
      stream.addData((1L, ts(10, 10), 1.0, 1L))
      query.processAllAvailable() // wm still at epoch: nothing emittable
      stream.addData((1L, ts(11, 40), 2.0, 2L))
      query.processAllAvailable() // wm = 10:10 - 30m: still nothing
      stream.addData((2L, ts(13, 0), 9.0, 3L)) // wm -> 11:10 next batch
      query.processAllAvailable()
    }
    // final wm = 12:30 (13:00 - 30m): ticks 11:00 (carrying 10:10's
    // value — 11:40 is later than that tick) and 12:00 (carrying 11:40)
    // emitted; tick 13:00 > wm stays unemitted
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, ts(11), ts(10, 10), 1.0),
      (1L, ts(12), ts(11, 40), 2.0)), s"got $out")
    assert(!out.exists(t => t._1 == 1L && t._2.after(ts(12))), s"got $out")
  }

  test("multi-batch stream equals batch locfGrid for ticks <= last observation") {
    // fed two-at-a-time in global time order so no event falls below
    // the GLOBAL watermark (below-watermark rows are dropped by the
    // stateful operator — the contract, not a bug)
    val rows = Seq(
      (1L, ts(10, 5), 1.0, 1L), (2L, ts(11, 30), 7.0, 5L),
      (1L, ts(12, 0), 2.0, 2L),
      (1L, ts(12, 0), 3.0, 3L), // same instant: max event_id wins
      (2L, ts(14, 10), 8.0, 6L), (1L, ts(15, 45), 4.0, 4L))
    val out = harness(3600L, "30 minutes") { (stream, query) =>
      rows.grouped(2).foreach { g =>
        stream.addData(g: _*); query.processAllAvailable()
      }
      // flush: a far-future event on a spare key pushes the watermark
      // past every real tick
      stream.addData((99L, ts(23, 0), 0.0, 99L))
      query.processAllAvailable()
    }
    val batch = GapFill.locfGrid(
        rows.toDF("user_id", "tss", "value", "event_id")
          .withColumn("ts", col("tss")).drop("tss"),
        "user_id", "ts", "value", 3600L, "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getDouble(3)))
      .sortBy(t => (t._1, t._2.getTime)).toSeq
    // the streamed rows at or before each key's last observation are the
    // batch grid exactly; beyond it the live monitor keeps ticking with
    // the stale carried value (the monitoring tail)
    val lastObs = rows.groupBy(_._1).view.mapValues(_.map(_._2.getTime).max)
    val streamedCore = out.filter(t =>
      t._1 != 99L && t._2.getTime <= lastObs(t._1))
    assert(streamedCore == batch, s"\nstream: $streamedCore\nbatch: $batch")
    // monitoring tail: stale rows carry the key's final observation
    val tail = out.filter(t => t._1 == 1L && t._2.getTime > lastObs(1L))
    assert(tail.nonEmpty && tail.forall(t => t._3 == ts(15, 45) && t._4 == 4.0),
      s"tail: $tail")
  }

  test("idle keys keep ticking via the event-time timeout") {
    val out = harness(3600L, "10 minutes") { (stream, query) =>
      stream.addData((1L, ts(10, 0), 5.0, 1L))
      query.processAllAvailable()
      // only OTHER keys arrive from here on; key 1 must still tick as
      // the watermark sweeps forward
      stream.addData((2L, ts(12, 0), 0.0, 2L))
      query.processAllAvailable()
      stream.addData((2L, ts(14, 0), 0.0, 3L))
      query.processAllAvailable()
    }
    val k1 = out.filter(_._1 == 1L)
    // wm reaches 13:50: ticks 10:00..13:00 all emitted for the idle key,
    // every one carrying the single stale observation
    assert(k1.map(_._2).toSeq == Seq(ts(10), ts(11), ts(12), ts(13)), s"got $k1")
    assert(k1.forall(t => t._3 == ts(10) && t._4 == 5.0))
  }

  test("tick-at-watermark is final: the engine drops events stamped AT the watermark") {
    // The emit bound (tick T emits when wm >= T) is safe ONLY because
    // Spark's late filter drops rows with ts <= wm (WatermarkSupport
    // .watermarkExpression: LessThanOrEqual against wm*1000, no -1 us).
    // This test pins that coupling: with wm landing EXACTLY on slot
    // 11:00, an event stamped exactly 11:00 must be dropped — were it
    // admitted, its data-triggered invocation would emit tick 11:00
    // carrying it, and the tick would not have been final. If a Spark
    // upgrade ever admits ts == wm, this fails and the bound must
    // become strict (wm*1000 - 1).
    val out = harness(3600L, "30 minutes") { (stream, query) =>
      stream.addData((1L, ts(10, 15), 1.0, 1L))
      query.processAllAvailable() // wm -> 9:45 next batch
      stream.addData((2L, ts(11, 30), 0.0, 2L)) // key 2 drives the wm
      query.processAllAvailable() // wm -> 11:00 EXACTLY
      // probe stamped exactly AT the watermark: must be DROPPED. Were
      // it admitted, this data-triggered invocation (wm == 11:00 ==
      // tick 11:00's bound) would emit tick 11:00 carrying 99.0 — a
      // value the already-final contract says cannot exist.
      stream.addData((1L, ts(11, 0), 99.0, 3L))
      query.processAllAvailable()
      stream.addData((2L, ts(13, 0), 0.0, 4L)) // wm -> 12:30, flush
      query.processAllAvailable()
    }
    val k1 = out.filter(_._1 == 1L)
    assert(k1 == Seq(
      (1L, ts(11), ts(10, 15), 1.0),
      (1L, ts(12), ts(10, 15), 1.0)), s"got $k1")
  }

  test("batch-twin parity holds for pre-epoch (negative-us) timestamps") {
    // 1969 data: slot arithmetic must floor (not truncate toward zero)
    // on both sides — the exact bug class fixed in batch GapFill r9
    val rows = Seq(
      (1L, Timestamp.valueOf("1969-12-30 22:10:00"), 1.0, 1L),
      (1L, Timestamp.valueOf("1969-12-31 03:40:00"), 2.0, 2L),
      (2L, Timestamp.valueOf("1969-12-31 01:05:00"), 7.0, 3L),
      (2L, Timestamp.valueOf("1969-12-31 23:59:00"), 8.0, 4L))
    val df = rows.toDF("user_id", "ts", "value", "event_id")
    val streamed = StreamingGapFill.locfTicks(df, 7200L,
        completeInput = true)
      .toDF().collect().map(_.toString).sorted.toSeq
    val batch = GapFill.locfGrid(df, "user_id", "ts", "value", 7200L,
        "event_id")
      .select(col("user_id"), col("slot_ts"), col("locf_obs_ts"),
        col("locf_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"\nstream: $streamed\nbatch: $batch")
  }

  test("batch-twin mode reproduces GapFill.locfGrid row-for-row on real data") {
    val events = Tables.events(spark, sf001).filter($"user_id" < 15)
    val streamed = StreamingGapFill.locfTicks(events, 21600L,
        completeInput = true)
      .toDF().collect()
      .map(_.toString).sorted.toSeq
    val batch = GapFill.locfGrid(events, "user_id", "ts", "value", 21600L,
        "event_id")
      .select(col("user_id"), col("slot_ts"), col("locf_obs_ts"),
        col("locf_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }
}
