package graft.streaming

import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One group's refreshed bottom-k sample: `seq` counts the micro-batches
  * that touched the group (so a consumer keeps the max-seq row per group),
  * `sample` is the ids in hash order — a prefix is a valid smaller sample.
  */
final case class GroupSample(group: String, seq: Long, sample: Seq[Long])

/** Streaming uniform sampling — the firehose twin of the batch
  * [[graft.operators.Sampling.bottomK]] Aggregator. Because the bottom-k
  * sketch is a deterministic, order-free mergeable summary ("the k ids
  * with the smallest knuth32 hash"), the streaming sample after ANY split
  * of the stream into micro-batches is bit-identical to the batch sample
  * over the same rows — exact parity, not approximate (StreamingSpec pins
  * it). That is the property that makes "maintain a representative 10k-doc
  * sample per source over an unbounded ingest firehose" work: state is one
  * O(k) buffer per group, constant in stream length, and arrival order
  * never biases the draw.
  *
  * Per-micro-batch working memory is O(k) too: rows fold off the iterator
  * into a local buffer (never materializing the batch), which then merges
  * into state — the same reduce/merge algebra the batch Aggregator runs.
  */
object StreamingSampling {

  def bottomKSample(rows: DataFrame, groupCol: String = "source",
      idCol: String = "doc_id", k: Int = 10): Dataset[GroupSample] = {
    val spark = rows.sparkSession
    import spark.implicits._

    def fn(group: String, it: Iterator[(String, Long)],
        state: GroupState[(Sampling.Buf, Long)]): Iterator[GroupSample] = {
      var local: Sampling.Buf = Vector.empty
      var any = false
      it.foreach { r => any = true; local = Sampling.insert(local, r._2, k) }
      if (!any) Iterator.empty
      else {
        val (prev, seq) = state.getOption.getOrElse((Vector.empty: Sampling.Buf, 0L))
        val merged = Sampling.mergeBufs(prev, local, k)
        state.update((merged, seq + 1))
        Iterator.single(GroupSample(group, seq + 1, merged.map(_._2)))
      }
    }

    rows
      .select(col(groupCol).cast("string").as("g"), col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Weighted twin: maintains the Efraimidis–Spirakis weighted-without-
    * replacement sample per group ([[graft.operators.Sampling.weightedK]])
    * over an unbounded stream. Same exact-parity property as the uniform
    * sampler — the A-ES keys derive from the deterministic hash, so any
    * micro-batching yields the batch Aggregator's draw bit-for-bit.
    */
  def weightedKSample(rows: DataFrame, groupCol: String = "source",
      idCol: String = "doc_id", weightCol: String = "weight",
      k: Int = 10): Dataset[GroupSample] = {
    val spark = rows.sparkSession
    import spark.implicits._

    def fn(group: String, it: Iterator[(String, Long, Double)],
        state: GroupState[(Sampling.WBuf, Long)]): Iterator[GroupSample] = {
      var local: Sampling.WBuf = Vector.empty
      var any = false
      it.foreach { r => any = true; local = Sampling.winsert(local, r._2, r._3, k) }
      if (!any) Iterator.empty
      else {
        val (prev, seq) = state.getOption.getOrElse((Vector.empty: Sampling.WBuf, 0L))
        val merged = Sampling.wmerge(prev, local, k)
        state.update((merged, seq + 1))
        Iterator.single(GroupSample(group, seq + 1, merged.map(_._2)))
      }
    }

    rows
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(weightCol).cast("double").as("w"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
