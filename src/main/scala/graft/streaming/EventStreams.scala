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
