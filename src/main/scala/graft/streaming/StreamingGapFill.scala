package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted grid tick: the key's state at an epoch-aligned slot
  * boundary, with the carried observation's own time (staleness =
  * `slot_ts − locf_obs_ts`).
  */
final case class GridTick(user_id: Long, slot_ts: java.time.Instant,
    locf_obs_ts: java.time.Instant, locf_value: Double)

/** Buffered observations + grid cursor for one key. `buf` is
  * time-sorted with same-instant ties already resolved (max tie-break
  * wins); its HEAD is the current carried observation once any tick has
  * consumed it, so LOCF advance and buffering share one structure.
  */
final case class GapFillAcc(nextK: Long, emittedAny: Boolean,
    buf: Vector[(Long, Double, Long)])

/** Streaming regular-grid LOCF — the live-monitoring twin of
  * [[graft.operators.GapFill.locfGrid]] (the stated motivation for the
  * batch form: fixed-step feature grids on a live stream). A tick at
  * slot time `T` is emitted exactly when the WATERMARK reaches `T`:
  * Spark's late filter drops rows stamped AT or before the watermark
  * (`ts <= wm`, WatermarkSupport.watermarkExpression), so at `wm ≥ T`
  * no event at or before `T` can still arrive and the carried value is
  * final (spec-pinned against the engine's actual drop boundary) — the streaming analogue of the batch
  * operator's "grid over the observed span", with the horizon driven by
  * watermark progress instead of max(ts).
  *
  * Parity contract (StreamingGapFillSpec pins it): for every slot the
  * stream emits with `slot_ts ≤ last observation`, the row is
  * BIT-IDENTICAL to the batch `locfGrid` row — same ceil/floor slot
  * arithmetic (Math.floorDiv, sign-safe like the batch operator's
  * pmod-adjusted DIV), same inclusive boundary, same max-tie-break
  * same-instant winner. Beyond the last observation the live grid keeps
  * ticking with the stale carried value as the watermark advances (that
  * is the monitoring use case; the batch form, which knows the corpus
  * ended, stops at floor(hi/step)).
  *
  * Mechanics: state per key buffers observations not yet final
  * (bounded by arrival rate × watermark delay) plus the carried head;
  * each invocation drains every tick ≤ watermark, and an
  * EventTimeTimeout pinned to the next tick keeps idle keys ticking —
  * emission never requires fresh data for the key. `completeInput =
  * true` runs the same code path over a complete (batch) relation:
  * the horizon becomes the key's max observation and the output IS
  * `locfGrid` row-for-row — the family's batch-twin recipe
  * ([[StreamingSpanDedup]]), which makes the gate a FULL oracle.
  */
object StreamingGapFill {

  def locfTicks(events: DataFrame, stepSeconds: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", tieBreakCol: String = "event_id",
      watermark: String = "30 minutes",
      completeInput: Boolean = false): Dataset[GridTick] = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    val spark = events.sparkSession
    import spark.implicits._

    def toUs(t: java.time.Instant): Long =
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    def toInstant(us: Long): java.time.Instant =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)
    // ceil(ts/step) under FLOOR-division semantics — sign-safe, the
    // batch operator's slot arithmetic exactly
    def ceilK(ts: Long): Long = Math.floorDiv(ts + stepUs - 1, stepUs)

    def fn(key: Long, rows: Iterator[(Long, java.time.Instant, Double, Long)],
        state: GroupState[GapFillAcc]): Iterator[GridTick] = {
      val incoming = rows.map(r => (toUs(r._2), r._3, r._4)).toVector
      val prev = state.getOption.getOrElse(GapFillAcc(0L, false, Vector.empty))
      // merge + same-instant resolution: max tie-break per instant (the
      // carried head participates, so a same-instant re-delivery with a
      // higher tie-break supersedes it before the next tick reads it)
      val buf0 =
        if (incoming.isEmpty) prev.buf
        else (prev.buf ++ incoming).groupBy(_._1).valuesIterator
          .map(_.maxBy(_._3)).toVector.sortBy(o => (o._1, o._3))
      if (buf0.isEmpty) { Iterator.empty }
      else {
        // before anything is emitted the grid start tracks the earliest
        // buffered observation; after, the cursor only moves forward
        var nextK =
          if (prev.emittedAny) prev.nextK else ceilK(buf0.head._1)
        // A tick at slot T is final when wm == T: Spark's late filter
        // drops rows with `ts <= watermarkMs * 1000` (WatermarkSupport
        // .watermarkExpression — AT-or-before, no −1 µs), so once the
        // watermark reaches T no event with ts ≤ T can be admitted in
        // any later batch, and same-batch rows for the key reach this
        // merge before the emission loop below. StreamingGapFillSpec
        // pins that drop boundary so a Spark change to a strict filter
        // would fail loudly here rather than emit non-final ticks.
        // Watermark 0 means "no watermark yet" (Spark initialises it
        // to 0 before the first update): nothing is final, emit
        // nothing — otherwise every pre-epoch slot would look final on
        // the first batch. The completeInput twin keeps the batch
        // operator's INCLUSIVE horizon (grid through floor(max/step)).
        val boundUs =
          if (completeInput) buf0.last._1
          else if (state.getCurrentWatermarkMs == 0L) Long.MinValue
          else state.getCurrentWatermarkMs * 1000L
        var buf = buf0
        val out = Vector.newBuilder[GridTick]
        var emitted = prev.emittedAny
        while (buf.head._1 <= nextK * stepUs && nextK * stepUs <= boundUs) {
          val t = nextK * stepUs
          var i = 0
          while (i + 1 < buf.length && buf(i + 1)._1 <= t) i += 1
          buf = buf.drop(i) // head = the carried observation for this tick
          out += GridTick(key, toInstant(t), toInstant(buf.head._1),
            buf.head._2)
          emitted = true
          nextK += 1
        }
        state.update(GapFillAcc(nextK, emitted, buf))
        if (!completeInput)
          // wake when the watermark passes the next tick, even if the key
          // goes quiet — a monitor must keep reporting stale state
          state.setTimeoutTimestamp(math.max(Math.floorDiv(nextK * stepUs, 1000L),
            state.getCurrentWatermarkMs + 1))
        out.result().iterator
      }
    }

    val obs = events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long"), col(tsCol),
        col(valueCol).cast("double"), col(tieBreakCol).cast("long"))
      .as[(Long, java.time.Instant, Double, Long)]
    obs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
