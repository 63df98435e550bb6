package graft.streaming

import graft.operators.QuantileSketch
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One shard's current KLL level stack, emitted whenever the shard sees
  * data. Shards partition the value space disjointly; folding the shard
  * artifacts with [[QuantileSketch.unionSketch]] yields a valid sketch
  * of the whole stream (same error class — QuantileSketchSpec pins it),
  * and while every shard stays inside its exact regime (n_shard ≤ k, no
  * compaction anywhere) the per-shard quantile answers are EXACT and
  * SQL-replayable, which is what the gate oracle pins.
  */
final case class ShardKll(shard: Int, levels: Seq[Seq[Double]])

/** Streaming KLL — the firehose twin of the batch
  * [[graft.operators.QuantileSketch]] aggregate, completing the
  * streaming sketch family (dedup, top-k, CMS, sampling, quantiles).
  * Values shard deterministically; each shard folds its micro-batch
  * into the O(k·log) level stack held in GroupState and emits the
  * refreshed artifact.
  *
  * State: nShards × O(k·log n) doubles — constant-bounded in stream
  * length. Per-batch working memory is the sketch itself: rows fold off
  * the iterator one insert at a time, never buffering the batch.
  */
object StreamingKll {

  /** `shardExpr` overrides the shard assignment (the gate query passes a
    * knuth32 layout so DuckDB can replay shard membership; the default
    * xxhash64 spreads adversarial value distributions better).
    */
  def quantileSketch(values: DataFrame, valueCol: String = "x",
      k: Int = 256, nShards: Int = 8,
      shardExpr: Option[Column] = None): Dataset[ShardKll] = {
    val spark = values.sparkSession
    import spark.implicits._

    def fn(shard: Int, rows: Iterator[(Int, Double)],
        state: GroupState[QuantileSketch.Buf]): Iterator[ShardKll] = {
      var buf = state.getOption.getOrElse(QuantileSketch.empty)
      var saw = false
      rows.foreach { r => saw = true; buf = QuantileSketch.insert(buf, r._2, k) }
      if (!saw) Iterator.empty
      else {
        state.update(buf)
        Iterator.single(ShardKll(shard, buf.levels))
      }
    }

    val shard = shardExpr
      .getOrElse(pmod(xxhash64(col(valueCol)), lit(nShards.toLong)))
    values
      .select(shard.cast("int").as("shard"),
        col(valueCol).cast("double").as("x"))
      .as[(Int, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
