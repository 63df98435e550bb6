package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Approximate heavy hitters via SpaceSaving (Metwally et al. 2005) as a
  * typed mergeable Aggregator — the 100 TB path to "top words/domains/keys"
  * without shuffling the full key space: each map task keeps at most
  * `capacity` counters, partials combine map-side, and only O(capacity)
  * rows per partition reach the shuffle (vs a full-vocabulary groupBy).
  * Merging follows the mergeable-summaries scheme (Agarwal et al. 2012):
  * sum matching counters, then prune back to capacity keeping the largest.
  *
  * Guarantees (spec-pinned): for every reported item, est ≥ true_count and
  * est − err ≤ true_count; any item with true frequency above ~2N/capacity
  * survives every prune. Estimates for near-threshold tail items depend on
  * partition order, so the gate entry is rows-only.
  */
object TopKSketch {

  private[graft] type Buf = Map[String, (Long, Long)] // item -> (est, err)

  /** One SpaceSaving insertion — shared by the batch Aggregator and the
    * streaming per-shard state (graft.streaming.StreamingTopK).
    */
  private[graft] def ssInsert(b: Buf, item: String, capacity: Int): Buf =
    b.get(item) match {
      case Some((est, err)) => b.updated(item, (est + 1, err))
      case None if b.size < capacity => b.updated(item, (1L, 0L))
      case None =>
        val (minItem, (minEst, _)) =
          b.minBy { case (i2, (est, _)) => (est, i2) }
        (b - minItem).updated(item, (minEst + 1, minEst))
    }

  /** Top-k view of a buffer, est desc then item asc. */
  private[graft] def ssTop(b: Buf, k: Int): Seq[(String, Long, Long)] =
    b.toSeq.sortBy { case (item, (est, _)) => (-est, item) }
      .take(k)
      .map { case (item, (est, err)) => (item, est, err) }

  private final class SpaceSaving(capacity: Int, k: Int)
      extends Aggregator[String, Buf, Seq[(String, Long, Long)]] {

    def zero: Buf = Map.empty

    private def prune(b: Buf): Buf =
      if (b.size <= capacity) b
      else b.toSeq.sortBy { case (item, (est, _)) => (-est, item) }
        .take(capacity).toMap

    def reduce(b: Buf, item: String): Buf = ssInsert(b, item, capacity)

    def merge(a: Buf, b: Buf): Buf =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else prune(b.foldLeft(a) { case (acc, (item, (est, err))) =>
        acc.get(item) match {
          case Some((e0, r0)) => acc.updated(item, (e0 + est, r0 + err))
          case None => acc.updated(item, (est, err))
        }
      })

    def finish(b: Buf): Seq[(String, Long, Long)] = ssTop(b, k)

    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** `top_k_sketch(expr)`: approximate top-k of a (string-castable) column.
    * Returns ARRAY<STRUCT<_1: item, _2: est, _3: err>> sorted by est desc.
    * `capacity` is the accuracy dial: error ≤ N/capacity per partial.
    */
  def topK(c: Column, k: Int = 20, capacity: Int = 256): Column =
    udaf(new SpaceSaving(capacity, k), ExpressionEncoder[String]())(c.cast("string"))
}
