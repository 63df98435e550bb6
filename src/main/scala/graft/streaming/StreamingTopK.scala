package graft.streaming

import graft.operators.TopKSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One shard's current heavy-hitter snapshot: item → (est, err) rows of the
  * shard's SpaceSaving buffer, emitted whenever the shard sees data.
  */
final case class ShardTopK(shard: Int, item: String, est: Long, err: Long)

/** Streaming heavy hitters — the firehose twin of the batch
  * [[graft.operators.TopKSketch]] aggregate (same relationship as
  * StreamingDedup to the batch banded join): items shard by hash so state
  * partitions across executors, each shard keeps ONE SpaceSaving buffer of
  * `capacity` counters in GroupState, and every micro-batch the shard
  * receives data it emits its refreshed top-k snapshot. Shards partition
  * the key space disjointly, so the union of shard snapshots IS the global
  * sketch (no cross-shard double counting); a consumer takes top-k of the
  * union.
  *
  * State: nShards × capacity counters — constant in stream length, the
  * property that makes "top domains/words ever seen" viable on an
  * unbounded stream. Per-micro-batch working memory is bounded by the
  * shard's DISTINCT batch items (counts folded off the iterator), never
  * its row count. No timeout by design: all-time heavy hitters, like
  * the dedup claims, are permanent state (RocksDB-resident at scale).
  */
object StreamingTopK {

  /** @param shardExpr optional custom shard assignment (must be an INT in
    *   [0, nShards)); defaults to xxhash64 of the item. A caller needing a
    *   cross-engine-replayable layout (the exact-regime oracle) passes a
    *   hash both engines can compute — sharding only partitions state, so
    *   any deterministic assignment yields the same global sketch.
    */
  def heavyHitters(items: DataFrame, itemCol: String = "w",
      k: Int = 20, capacity: Int = 256, nShards: Int = 8,
      shardExpr: Option[org.apache.spark.sql.Column] = None): Dataset[ShardTopK] = {
    val spark = items.sparkSession
    import spark.implicits._

    def fn(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[TopKSketch.Buf]): Iterator[ShardTopK] = {
      // pre-aggregate the micro-batch per item STRAIGHT OFF the iterator:
      // executor memory is bounded by the batch's distinct items in this
      // shard (vocabulary), never its row count — materializing the raw
      // token stream per group would defeat the sketch's whole point.
      // Item-sorted insertion keeps the emitted snapshot deterministic for
      // a given batch content (micro-batch arrival order is undefined).
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { r => counts.update(r._2, counts.getOrElse(r._2, 0L) + 1L) }
      if (counts.isEmpty) Iterator.empty
      else {
        var buf = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
        counts.toSeq.sortBy(_._1).foreach { case (item, n) =>
          buf = TopKSketch.ssInsertN(buf, item, n, capacity)
        }
        state.update(buf)
        TopKSketch.ssTop(buf, k).iterator.map { case (item, est, err) =>
          ShardTopK(shard, item, est, err)
        }
      }
    }

    items
      .select(shardExpr
          .getOrElse(pmod(xxhash64(col(itemCol)), lit(nShards.toLong)))
          .cast("int").as("shard"),
        col(itemCol).cast("string").as("item"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
