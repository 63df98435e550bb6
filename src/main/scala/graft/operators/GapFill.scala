package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid gap fill with last-observation-carried-forward — the
  * feature-engineering step that turns an irregular event stream into the
  * fixed-step grid ML training and monitoring expect (one row per
  * (key, slot), each carrying the latest observation at or before the
  * slot boundary). The time-series member of the event family beside
  * [[AsofJoin]] (point lookups) and the windowed aggregates (summaries):
  * LOCF answers "what WAS the state at every tick", which neither does.
  * Distinct from the `w_gap_fill_locf` window idiom (null repair at the
  * EXISTING event rows — `last(ignoreNulls)` over the row frame): this
  * operator GENERATES the regular tick rows and resamples onto them.
  *
  * Plan shape — no per-key collect, no range join, no explosion:
  *  1. one aggregate derives each key's observed span (min/max event
  *     micros);
  *  2. the grid generates map-side from the span (epoch-aligned slot
  *     numbers `ceil(lo/step) .. floor(hi/step)` — integer DIV arithmetic
  *     end to end, so boundaries are exact at microsecond precision; keys
  *     whose span straddles no boundary emit nothing);
  *  3. the fill reuses [[AsofJoin.asofJoin]]'s union-scan idiom: grid and
  *     observations union, ONE window per key ordered by time carries the
  *     last observation forward — one shuffle, one sort, state bounded by
  *     a single struct per row.
  *
  * Same-instant observations are deduplicated first (max `tieBreakCol`
  * wins) so the carried value is deterministic under any partitioning.
  * Slot boundaries are INCLUSIVE: an observation exactly on the tick is
  * that tick's value — the as-of convention.
  *
  * Output: (key, slot_ts, locf_obs_ts, locf_value); `locf_obs_ts` is the
  * carried observation's own time, so staleness at each tick is
  * `slot_ts − locf_obs_ts` for free. First slot ≥ first observation by
  * construction, so the value is never null.
  */
object GapFill {

  def locfGrid(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long,
      tieBreakCol: String): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    // deterministic same-instant winner: max tie-break per (key, instant)
    val obs = events
      .select(col(keyCol), col(tsCol).as("__ots"),
        col(valueCol).as("__v"), col(tieBreakCol).as("__tb"))
      .groupBy(col(keyCol), col("__ots"))
      .agg(max_by(col("__v"), col("__tb")).as("__v"))
    val spans = obs.groupBy(col(keyCol))
      .agg(min(unix_micros(col("__ots"))).as("__lo"),
        max(unix_micros(col("__ots"))).as("__hi"))
    // FLOOR division, not Spark's truncate-toward-zero DIV: for pre-1970
    // timestamps (negative epoch micros) truncation rounds the wrong way
    // and the grid would disagree with floor-semantics engines (DuckDB
    // `//`) and with itself across the epoch. pmod-adjusting the
    // numerator makes it an exact multiple, where DIV is sign-safe —
    // ceil(lo/step) = floorDiv(lo + step - 1, step) holds for any sign.
    def floorDiv(num: String): String =
      s"(($num) - pmod($num, ${stepUs}L)) DIV ${stepUs}L"
    val grid = spans
      .select(col(keyCol),
        expr(floorDiv(s"__lo + ${stepUs - 1}L")).as("__k0"),
        expr(floorDiv("__hi")).as("__k1"))
      // Spark's sequence() flips to step -1 when start > stop — a span
      // straddling no boundary must emit nothing, not count backwards
      .filter(col("__k0") <= col("__k1"))
      .select(col(keyCol),
        explode(sequence(col("__k0"), col("__k1"))).as("__k"))
      .select(col(keyCol),
        timestamp_micros(col("__k") * stepUs).as("slot_ts"))
    AsofJoin.asofJoin(
        grid.withColumn("__ots", col("slot_ts")),
        obs, keys = Seq(keyCol), tsCol = "__ots", rightPrefix = "locf_")
      .select(col(keyCol), col("slot_ts"),
        col("locf___ots").as("locf_obs_ts"),
        col("locf___v").as("locf_value"))
  }
}
