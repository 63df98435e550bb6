package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global rank / NTILE without the single-partition window.
  *
  * Spark's `Window.orderBy(...)` with no `partitionBy` moves EVERY row into
  * one partition ("No Partition Defined for Window operation") — a
  * single-task sort that dies at 100 TB. This operator is the two-pass plan
  * that scales (round-1 verdict item 4):
  *
  *   1. range-repartition on the order keys (explicit partition count, so
  *      AQE never re-coalesces between passes) + sort within partitions;
  *   2. partition-local row index from `monotonically_increasing_id()`
  *      (pid in the high bits, a per-partition counter in the low 33 —
  *      fully codegen, no window);
  *   3. per-partition counts → driver-side cumulative offsets. The collect
  *      is bounded by the partition count (one long per partition, exactly
  *      the metadata RangePartitioner itself gathers), never by the data;
  *   4. global rank = partition offset + local index, attached via a
  *      broadcast join on pid.
  *
  * Rank values are deterministic across recomputes as long as the order
  * keys are a total order (unique): range boundaries only decide WHICH
  * partition a row lands in, not its global rank.
  */
object GlobalRank {

  /** Per-partition (pid, localIndex) from monotonically_increasing_id's
    * layout: id = pid << 33 | row-index-within-partition.
    */
  private def withPidAndLocal(df: DataFrame, numPartitions: Int, order: Seq[Column]): DataFrame =
    df.repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .withColumn("__lrn", col("__mid") - shiftleft(shiftright(col("__mid"), 33), 33))

  /** (rankedDf, totalRows): df + a 1-based dense global `rankCol` ordered by
    * `order` (which must be a total order for deterministic output).
    */
  def withGlobalRank(df: DataFrame, rankCol: String, order: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val local = withPidAndLocal(df, p, order)
    // pass 1: one row per range partition (map-side partial agg → tiny shuffle)
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, cnt)) => (pid, acc + cnt) }
    val running = counts.map(_._1).zip(offsets.map(_._2)).map { case (pid, off) => (pid, off) }
    val offDf = spark.createDataFrame(running.toSeq).toDF("__pid", "__offset")
    val ranked = local.join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__offset") + col("__lrn") + lit(1L))
      .drop("__mid", "__pid", "__lrn", "__offset")
    (ranked, n)
  }

  /** Exact NTILE(k) over a total order, as a scale-safe two-pass plan.
    * Closed form over the global rank r with n rows: the first n % k
    * buckets hold ceil(n/k) rows, the rest floor(n/k) — identical output
    * (IntegerType) to `ntile(k).over(Window.orderBy(order))`.
    */
  def withNtile(df: DataFrame, k: Int, tileCol: String, order: Column*): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1, got $k")
    val (ranked, n) = withGlobalRank(df, "__rank", order: _*)
    val q = n / k       // small-bucket size
    val rem = n % k     // number of big (q+1) buckets
    val cutoff = rem * (q + 1)
    // doubles are exact here for n < 2^53; the otherwise-branch divisor is
    // guarded (unreachable when q == 0, since then cutoff == n >= rank)
    val tile = when(col("__rank") <= lit(cutoff),
        floor((col("__rank") - 1) / lit((q + 1).toDouble)) + 1)
      .otherwise(
        floor((col("__rank") - lit(cutoff) - 1) / lit(math.max(q, 1L).toDouble)) + lit(rem) + 1)
    ranked.withColumn(tileCol, tile.cast("int")).drop("__rank")
  }
}
