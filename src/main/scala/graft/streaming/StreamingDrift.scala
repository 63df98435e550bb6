package graft.streaming

import graft.operators.QuantileSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One source's refreshed drift row: bucket occupancy counts (bounded
  * state — nBuckets longs however long the stream runs) and the PSI
  * score against the frozen reference masses.
  */
final case class SourceDrift(source: String, n: Long, counts: Seq[Long],
    psi: Double)

/** Streaming distribution-drift monitor — the firehose twin of the
  * batch PSI report (`t_psi_drift_by_source`), wired the way production
  * monitors actually run: bucket boundaries are FROZEN from the
  * reference corpus (here: decile cuts read off a [[QuantileSketch]]
  * artifact — the persisted sketch is exactly the thing that makes the
  * boundaries reproducible without rescanning the reference), and the
  * stream scores against the reference's bucket masses under the same
  * add-one smoothing the batch report uses.
  *
  * State per source = nBuckets longs in GroupState; each micro-batch
  * folds its rows off the iterator (one binary search per row) and
  * emits the refreshed PSI. No shuffle of the stream beyond the
  * source-key grouping; the boundaries and reference masses ride the
  * task closure.
  */
// Serializable: the state function calls this object's own bucketOf/
// psiOf, so the closure captures the module itself (unlike the sibling
// twins, whose state functions only call OTHER modules, loaded
// statically inside the lambda body)
object StreamingDrift extends Serializable {

  /** Decile-style cut points (nBuckets − 1 of them) from a KLL level
    * stack: boundary i = quantile(i / nBuckets). In the sketch's exact
    * regime these are the exact reference quantiles.
    */
  def boundariesFromSketch(levels: Seq[Seq[Double]], nBuckets: Int)
      : Array[Double] =
    (1 until nBuckets)
      .map(i => QuantileSketch.quantile(levels, i.toDouble / nBuckets))
      .toArray

  /** Bucket of `v` under `bounds` (ascending cut points): the count of
    * cuts strictly below v — bucket b holds (bounds(b-1), bounds(b)].
    * Mirrors the batch NTILE convention of "smallest v with rank ≥
    * target" closely enough that the exact-regime spec pins parity.
    */
  private[graft] def bucketOf(v: Double, bounds: Array[Double]): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Add-one-smoothed PSI of `counts` against `refCounts`. */
  private[graft] def psiOf(counts: Array[Long], refCounts: Array[Long])
      : Double = {
    val n = counts.sum.toDouble
    val rn = refCounts.sum.toDouble
    var s = 0.0
    var i = 0
    while (i < counts.length) {
      val p = (counts(i) + 1).toDouble / (n + counts.length)
      val q = (refCounts(i) + 1).toDouble / (rn + refCounts.length)
      s += (p - q) * math.log(p / q)
      i += 1
    }
    s
  }

  def psiAgainstReference(rows: DataFrame, bounds: Array[Double],
      refCounts: Array[Long], valueCol: String = "n_chars",
      sourceCol: String = "source"): Dataset[SourceDrift] = {
    require(refCounts.length == bounds.length + 1,
      "refCounts must have one more entry than bounds")
    val spark = rows.sparkSession
    import spark.implicits._
    val nBuckets = refCounts.length

    def fn(source: String, it: Iterator[(String, Double)],
        state: GroupState[Array[Long]]): Iterator[SourceDrift] = {
      val counts = state.getOption.getOrElse(new Array[Long](nBuckets))
      var saw = false
      it.foreach { r => saw = true; counts(bucketOf(r._2, bounds)) += 1L }
      if (!saw) Iterator.empty
      else {
        state.update(counts)
        Iterator.single(SourceDrift(source, counts.sum, counts.toSeq,
          psiOf(counts, refCounts)))
      }
    }

    rows
      .select(col(sourceCol).cast("string").as("source"),
        col(valueCol).cast("double").as("v"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
