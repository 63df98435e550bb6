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
  * an item absent from one side is charged that side's MINIMUM counter
  * (its maximum possible uncounted occurrences there — zero when that
  * sketch is below capacity, since then it saw every distinct item), both
  * est and err, then the union is pruned back to capacity keeping the
  * largest. Charging the minimum is what preserves the one-sided
  * overestimate across merges: an item evicted from one partial's buffer
  * can have occurred at most that buffer's min-counter times there.
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
    ssInsertN(b, item, 1L, capacity)

  /** Count-weighted insertion: `n` occurrences of `item` at once. Identical
    * to n sequential [[ssInsert]]s while the item stays resident (the exact
    * regime in particular); in the eviction regime it charges min+n / err
    * min in one step, which preserves both SpaceSaving bounds (the item had
    * at most `min` unseen prior occurrences). Lets streaming consumers
    * pre-aggregate a micro-batch per item before touching state.
    */
  private[graft] def ssInsertN(b: Buf, item: String, n: Long, capacity: Int): Buf =
    b.get(item) match {
      case Some((est, err)) => b.updated(item, (est + n, err))
      case None if b.size < capacity => b.updated(item, (n, 0L))
      case None =>
        val (minItem, (minEst, _)) =
          b.minBy { case (i2, (est, _)) => (est, i2) }
        (b - minItem).updated(item, (minEst + n, minEst))
    }

  /** Top-k view of a buffer, est desc then item asc. */
  private[graft] def ssTop(b: Buf, k: Int): Seq[(String, Long, Long)] =
    b.toSeq.sortBy { case (item, (est, _)) => (-est, item) }
      .take(k)
      .map { case (item, (est, err)) => (item, est, err) }

  /** Guarantee-preserving SpaceSaving merge: an item absent from a side is
    * charged (min, min) of that side — the most it can have occurred there
    * unseen (0 while the sketch is under capacity: nothing was evicted yet,
    * so absence means true count 0 on that side). Summing matched counters
    * alone would UNDER-count items evicted from one partial, breaking the
    * est ≥ true_count bound under adversarial partitioning.
    */
  private[graft] def ssMerge(a: Buf, b: Buf, capacity: Int): Buf =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val minA = if (a.size < capacity) 0L else a.valuesIterator.map(_._1).min
      val minB = if (b.size < capacity) 0L else b.valuesIterator.map(_._1).min
      val merged = (a.keySet | b.keySet).iterator.map { item =>
        val (ea, ra) = a.getOrElse(item, (minA, minA))
        val (eb, rb) = b.getOrElse(item, (minB, minB))
        item -> (ea + eb, ra + rb)
      }.toMap
      // prune keeps survivors' counters intact, so reported items keep the
      // one-sided overestimate; dropped items are below the kept minimum
      if (merged.size <= capacity) merged
      else merged.toSeq.sortBy { case (item, (est, _)) => (-est, item) }
        .take(capacity).toMap
    }

  private final class SpaceSaving(capacity: Int, k: Int)
      extends Aggregator[String, Buf, Seq[(String, Long, Long)]] {

    def zero: Buf = Map.empty

    def reduce(b: Buf, item: String): Buf = ssInsert(b, item, capacity)

    def merge(a: Buf, b: Buf): Buf = ssMerge(a, b, capacity)

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
