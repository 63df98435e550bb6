package graft

import graft.operators.GapFill
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Double, Long)*) =
    rows.toDF("user_id", "tss", "value", "event_id")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("LOCF grid: epoch-aligned slots, carried values, inclusive boundary") {
    val events = ev(
      (1L, "2024-01-01 00:30:00", 10.0, 1L),
      (1L, "2024-01-01 02:00:00", 20.0, 2L), // exactly on a 2h tick
      (1L, "2024-01-01 05:10:00", 30.0, 3L))
    val g = GapFill.locfGrid(events, "user_id", "ts", "value",
        stepSeconds = 7200L, tieBreakCol = "event_id")
      .orderBy("slot_ts").collect()
    // span [00:30, 05:10] -> ticks 02:00, 04:00 (00:00 precedes first obs)
    assert(g.map(_.getAs[java.sql.Timestamp]("slot_ts").toString).toSeq ==
      Seq("2024-01-01 02:00:00.0", "2024-01-01 04:00:00.0"))
    // tick 02:00 carries the observation AT the tick (inclusive), not 00:30
    assert(g.map(_.getAs[Double]("locf_value")).toSeq == Seq(20.0, 20.0))
    assert(g.map(_.getAs[java.sql.Timestamp]("locf_obs_ts").toString).toSeq ==
      Seq("2024-01-01 02:00:00.0", "2024-01-01 02:00:00.0"))
  }

  test("same-instant observations: max tie-break wins deterministically") {
    val events = ev(
      (1L, "2024-01-01 01:00:00", 5.0, 10L),
      (1L, "2024-01-01 01:00:00", 7.0, 11L), // same instant, higher id
      (1L, "2024-01-01 03:00:00", 9.0, 12L))
    val g = GapFill.locfGrid(events, "user_id", "ts", "value", 7200L,
      "event_id").orderBy("slot_ts").collect()
    assert(g.head.getAs[Double]("locf_value") == 7.0)
  }

  test("span straddling no tick emits nothing; multi-key grids are independent") {
    val events = ev(
      (1L, "2024-01-01 00:10:00", 1.0, 1L), // span [00:10, 00:20] — no 2h tick
      (1L, "2024-01-01 00:20:00", 2.0, 2L),
      (2L, "2024-01-01 00:00:00", 3.0, 3L), // on-tick single obs: one slot
      (3L, "2024-01-01 01:00:00", 4.0, 4L),
      (3L, "2024-01-01 09:00:00", 5.0, 5L))
    val g = GapFill.locfGrid(events, "user_id", "ts", "value", 7200L,
      "event_id")
    val byUser = g.collect().groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(!byUser.contains(1L))
    assert(byUser(2L) == 1)
    assert(byUser(3L) == 4) // ticks 02,04,06,08
    // every grid value is non-null: first slot >= first observation
    assert(g.filter(col("locf_value").isNull).count() == 0)
  }

  test("pre-1970 timestamps: floor-division slots, not truncate-toward-zero") {
    // negative epoch micros: span [21:30, 23:10] on 1969-12-31 with a 2h
    // step has exactly one tick, 22:00 (k = -1). Truncating DIV would
    // compute k0 = k1 = 0 and emit a bogus 1970-01-01 00:00 slot AFTER
    // the observed span — the ADVICE-flagged divergence from
    // floor-semantics engines (DuckDB //)
    val events = ev(
      (1L, "1969-12-31 21:30:00", 1.0, 1L),
      (1L, "1969-12-31 23:10:00", 2.0, 2L))
    val g = GapFill.locfGrid(events, "user_id", "ts", "value", 7200L,
      "event_id").orderBy("slot_ts").collect()
    assert(g.map(_.getAs[java.sql.Timestamp]("slot_ts").toString).toSeq ==
      Seq("1969-12-31 22:00:00.0"), s"got ${g.toSeq}")
    assert(g.head.getAs[Double]("locf_value") == 1.0)
    // a span crossing the epoch grids continuously through it
    val cross = ev(
      (2L, "1969-12-31 23:00:00", 1.0, 1L),
      (2L, "1970-01-01 03:30:00", 2.0, 2L))
    val gc = GapFill.locfGrid(cross, "user_id", "ts", "value", 7200L,
      "event_id").orderBy("slot_ts").collect()
    assert(gc.map(_.getAs[java.sql.Timestamp]("slot_ts").toString).toSeq ==
      Seq("1970-01-01 00:00:00.0", "1970-01-01 02:00:00.0"))
  }

  test("deterministic under repartitioning; real-table grid is dense per user") {
    val events = Tables.events(spark, sf001).filter($"user_id" < 10)
    def run(df: org.apache.spark.sql.DataFrame) =
      GapFill.locfGrid(df, "user_id", "ts", "value", 21600L, "event_id")
        .collect().map(_.toString).sorted.toSeq
    assert(run(events) == run(events.repartition(13)))
    // per user the slots are consecutive 6h ticks (dense grid, no holes)
    val slots = GapFill.locfGrid(events, "user_id", "ts", "value", 21600L,
        "event_id")
      .select($"user_id", unix_micros($"slot_ts").as("us"))
      .orderBy($"user_id", $"us").collect()
      .groupBy(_.getLong(0)).values
    slots.foreach { rows =>
      val us = rows.map(_.getLong(1))
      us.sliding(2).foreach { case Array(a, b) =>
        assert(b - a == 21600L * 1000000L, s"grid hole between $a and $b")
      }
    }
  }
}
