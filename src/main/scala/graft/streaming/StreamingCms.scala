package graft.streaming

import graft.operators.CmsSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One shard's current CMS table snapshot, emitted whenever the shard
  * sees data. Shards partition the key space disjointly, so summing all
  * shard tables elementwise reconstructs the single-pass global sketch
  * EXACTLY (CMS merge is plain addition).
  */
final case class ShardCms(shard: Int, table: Seq[Long])

/** Streaming Count-Min — the firehose twin of the batch
  * [[graft.operators.CmsSketch]] aggregate. Items shard by hash so state
  * partitions across executors; each shard folds its micro-batch into
  * one d×w long table held in GroupState and emits the refreshed table.
  * Because CMS updates and merges are exact integer addition, the final
  * union-of-shards snapshot is BIT-IDENTICAL to the batch sketch under
  * any micro-batching (spec-pinned) — the same determinism contract as
  * the streaming bottom-k sampler.
  *
  * State: nShards × d × w longs — constant in stream length. Per-batch
  * working memory is bounded by the shard's distinct batch items (counts
  * folded off the iterator), never its row count.
  */
object StreamingCms {

  def pointCounts(items: DataFrame, itemCol: String = "w",
      d: Int = 4, w: Int = 1024, nShards: Int = 8): Dataset[ShardCms] = {
    val spark = items.sparkSession
    import spark.implicits._

    def fn(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[Array[Long]]): Iterator[ShardCms] = {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { r => counts.update(r._2, counts.getOrElse(r._2, 0L) + 1L) }
      if (counts.isEmpty) Iterator.empty
      else {
        val t = state.getOption.getOrElse(new Array[Long](d * w))
        counts.foreach { case (item, n) => CmsSketch.cmsInsert(t, item, d, w, n) }
        state.update(t)
        Iterator.single(ShardCms(shard, t.toSeq))
      }
    }

    items
      .select(pmod(xxhash64(col(itemCol)), lit(nShards.toLong))
          .cast("int").as("shard"),
        col(itemCol).cast("string").as("item"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
