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
  * unbounded stream. No timeout by design: all-time heavy hitters, like
  * the dedup claims, are permanent state (RocksDB-resident at scale).
  */
object StreamingTopK {

  def heavyHitters(items: DataFrame, itemCol: String = "w",
      k: Int = 20, capacity: Int = 256, nShards: Int = 8): Dataset[ShardTopK] = {
    val spark = items.sparkSession
    import spark.implicits._

    def fn(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[TopKSketch.Buf]): Iterator[ShardTopK] = {
      // micro-batch arrival order is undefined: sort so the emitted
      // snapshot is deterministic for a given batch content
      val batch = rows.map(_._2).toVector.sorted
      if (batch.isEmpty) Iterator.empty
      else {
        var buf = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
        batch.foreach { item => buf = TopKSketch.ssInsert(buf, item, capacity) }
        state.update(buf)
        TopKSketch.ssTop(buf, k).iterator.map { case (item, est, err) =>
          ShardTopK(shard, item, est, err)
        }
      }
    }

    items
      .select(pmod(xxhash64(col(itemCol)), lit(nShards.toLong)).cast("int").as("shard"),
        col(itemCol).cast("string").as("item"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
