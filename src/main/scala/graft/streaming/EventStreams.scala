package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the events schema (SURVEY.md §2.10).
  * Each transform takes ANY events-shaped DataFrame — batch or streaming —
  * so the exact same logical plan runs under `readStream` with incremental
  * state and under batch for the DuckDB oracle (graft.queries.EventQueries
  * holds the batch-checkable equivalents). That one-plan-two-modes property
  * is the point of Structured Streaming; nothing here is stream-specific
  * except the watermark, which batch execution ignores.
  *
  * State sizing at scale: every aggregation below keys its state by
  * (window, ...) or (user_id) AFTER a watermark, so state is bounded by the
  * watermark horizon × key cardinality, not by stream length.
  */
/** Open-session accumulator for [[EventStreams.statefulSessionize]] — top
  * level (not nested/private) because the GroupState encoder's generated
  * code must reach the constructor and accessors.
  */
final case class SessionAcc(startUs: Long, lastUs: Long, n: Long, total: Double)

object EventStreams {

  /** Tumbling 10-minute event-time counts with a 1-hour watermark:
    * late events beyond the horizon are dropped, state for closed windows is
    * evicted.
    */
  def tumblingCounts(events: DataFrame,
      width: String = "10 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding window (width, slide). */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"),
        col("window.end").as("bucket_end"), col("event_type"), col("n"))

  /** Gap-based session windows per user (30-minute inactivity gap) —
    * session_window keeps one merging state per open session per user.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: pair each left event with right events for
    * the same user within `maxDelay` before it. Watermarks on BOTH sides +
    * the time bound let Spark evict join state — without the bound the
    * right-side buffer would grow forever. The same plan runs in batch
    * (where the watermark is ignored and the range predicate just filters).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      maxDelay: String = "15 minutes", watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("left_id"), col("ts").as("left_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user_id"), col("event_id").as("right_id"),
        col("ts").as("right_ts"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("right_ts") >= col("left_ts") - expr(s"INTERVAL '$maxDelay'") &&
        col("right_ts") <= col("left_ts"))
      .select(col("user_id"), col("left_id"), col("left_ts"),
        col("right_id"), col("right_ts"))
  }

  /** Stream-static enrichment: streaming events joined to a static dimension
    * — the dim side broadcasts per micro-batch, no streaming state at all.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** A closed user session emitted by [[statefulSessionize]]. Instants (not
    * java.sql.Timestamp) because event timestamps carry microseconds and
    * Timestamp.getTime-based math silently truncates to millis.
    */
  final case class ClosedSession(
      user_id: Long, session_start: java.time.Instant,
      session_end: java.time.Instant, n_events: Long, total_value: Double)


  /** Custom-state sessionization via flatMapGroupsWithState (SURVEY.md
    * §2.10 / the north-star "custom state" path): per-user gap sessions
    * tracked in explicit GroupState, closed sessions emitted in Append mode
    * either when a later event arrives past the gap or when the event-time
    * timeout fires (watermark passed session_end + gap with no new data).
    *
    * This is the semantics `e_sessionize_30min_gap` oracle-checks in batch
    * (lag + cumulative-sum construction); here the same sessions come from
    * imperative state, demonstrating arbitrary stateful logic the built-in
    * session_window can't express (per-key caps, custom merge rules, ...).
    * State is one O(1) record per ACTIVE user — bounded by concurrent
    * users within the gap horizon, never by stream length; eviction is the
    * event-time timeout, so state cannot leak at 100 TB/day rates.
    *
    * Input micro-batches are not time-ordered within a group, so each
    * invocation sorts its events; events older than the current session's
    * last timestamp minus the gap would belong to an already-emitted
    * session and are counted into the current one conservatively (the
    * watermark bounds how stale they can be).
    */
  def statefulSessionize(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 hour"): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    def toUs(t: java.time.Instant): Long =
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    def toInstant(us: Long): java.time.Instant =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)

    def fn(userId: Long, rows: Iterator[(Long, java.time.Instant, Double)],
        state: GroupState[SessionAcc]): Iterator[ClosedSession] = {
      def close(a: SessionAcc) = ClosedSession(userId,
        toInstant(a.startUs), toInstant(a.lastUs), a.n, a.total)
      if (!rows.hasNext && state.hasTimedOut) {
        // watermark passed lastUs + gap with no new events: session is final
        val out = state.getOption.map(close).toIterator
        state.remove()
        out
      } else {
        val sorted = rows.toVector.sortBy(r => (toUs(r._2), r._1))
        var acc = state.getOption.orNull
        val closed = Vector.newBuilder[ClosedSession]
        sorted.foreach { case (_, t, v) =>
          val us = toUs(t)
          acc = acc match {
            case null => SessionAcc(us, us, 1L, v)
            case a if us - a.lastUs > gapUs =>
              closed += close(a)
              SessionAcc(us, us, 1L, v)
            case a =>
              // min() on the start: a late event above the watermark but
              // older than the current session's start must extend the
              // session BACKWARDS, or the reported start postdates the
              // session's earliest counted event
              SessionAcc(math.min(a.startUs, us), math.max(a.lastUs, us),
                a.n + 1L, a.total + v)
          }
        }
        if (acc != null) {
          state.update(acc)
          state.setTimeoutTimestamp((acc.lastUs + gapUs) / 1000L)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.time.Instant, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: Long, it: Iterator[(Long, Long, java.time.Instant, Double)],
            s: GroupState[SessionAcc]) =>
          fn(k, it.map(r => (r._2, r._3, r._4)), s))
  }

  /** Standard sink: append-mode parquet with checkpointing — completes the
    * readStream → transform → writeStream pipeline (SURVEY.md §2.10). The
    * caller owns trigger/await; checkpoint dir carries exactly-once state.
    */
  def toParquetSink(df: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
