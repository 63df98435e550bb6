package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-column scan pruning — the
  * lakehouse clustering technique (Delta/Iceberg `ZORDER BY`): rows sorted
  * by the bit-interleaving of several key columns land in files whose
  * per-file min/max ranges are narrow on EVERY key, so parquet row-group
  * and file skipping prunes scans filtered on any subset of those keys.
  * A single-column sort gives perfect pruning on one key and none on the
  * others; Z-order trades a little of the first key's locality for
  * locality on all of them.
  *
  * Everything here is Column arithmetic (shift/mask/or — whole-stage
  * codegen, no UDF): each key is rank-normalized to 16 bits via its
  * quantile bucket (deterministic Greenwald–Khanna sketch, the same
  * approach GlobalRank uses for boundaries), bits are spread with the
  * classic mask sequence, and the interleaved value is the sort key.
  * At 100 TB this is exactly `repartitionByRange(zvalue) + write`: one
  * shuffle to lay the corpus on the curve, amortized over every
  * downstream multi-key scan.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i —
    * the standard Morton mask ladder, expressed over Spark longs.
    */
  private def spreadBits16(v: Column): Column = {
    val m = List(
      (8, lit(0x00FF00FF00FF00FFL)),
      (4, lit(0x0F0F0F0F0F0F0F0FL)),
      (2, lit(0x3333333333333333L)),
      (1, lit(0x5555555555555555L)))
    m.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(mask)
    }
  }

  /** 16-bit rank bucket of a numeric column from ≤ 65535 deterministic
    * quantile cut points... in practice `buckets` cut points (≤ 4096 keeps
    * the comparison-sum plan small); ranks spread uniformly regardless of
    * the value distribution, which is what makes interleaving meaningful
    * for skewed keys.
    */
  private def rankBucket(df: DataFrame, c: Column, buckets: Int): Column = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val keyed = df.select(c.cast("double").as("__z"))
    val bounds = keyed.stat.approxQuantile("__z", probs, 0.001).distinct.sorted
    bounds.map(b => when(c.cast("double") >= lit(b), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
  }

  /** Raw 32-bit Morton interleave of two ≤16-bit non-negative values —
    * the bit kernel under [[zValue]], exposed for direct verification.
    */
  def interleave(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** The interleaved Z-value of two numeric key columns (16 bits each →
    * 32-bit Morton code). `buckets` bounds the quantile-sketch plan size.
    * Rank buckets need only be monotone in the key — small quantile-edge
    * shifts move a row one curve cell, never off the curve.
    */
  def zValue(df: DataFrame, a: Column, b: Column, buckets: Int = 256): Column =
    interleave(rankBucket(df, a, buckets), rankBucket(df, b, buckets))

  /** Lay `df` out on the Morton curve of (a, b): range-repartition +
    * sort by z-value. Writing the result yields files min/max-narrow on
    * BOTH keys. (Range boundaries here only affect file balance, never
    * row values — unlike GlobalRank there is no cross-pass consistency
    * requirement, so repartitionByRange is fine.)
    */
  def layout(df: DataFrame, a: Column, b: Column,
      numFiles: Int, buckets: Int = 256): DataFrame = {
    val z = zValue(df, a, b, buckets)
    df.withColumn("__zv", z)
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
  }
}
