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

  /** 16-bit rank bucket of a numeric column: bucket = number of quantile
    * cut points ≤ v, via `Arrays.binarySearch` over the closure-captured
    * bounds inside one UDF call — O(log buckets) per row. Rank buckets
    * spread uniformly regardless of the value distribution, which is what
    * makes interleaving meaningful for skewed keys. (A pure-expression form
    * — Σ of per-bound `when` comparisons — measured 5 µs/row: the generated
    * method exceeds the JIT's "huge method" limit and runs interpreted, so
    * one virtual UDF call beats hundreds of codegen'd branches.)
    */
  private def bucketExpr(c: Column, bounds: Array[Double]): Column = {
    val f = udf { (v: java.lang.Double) =>
      if (v == null) 0L
      else {
        val i = java.util.Arrays.binarySearch(bounds, v.doubleValue())
        // bounds are distinct: exact hit at i → i+1 values ≤ v;
        // miss → insertion point −i−1 = count of bounds < v (none equal)
        (if (i >= 0) i + 1 else -i - 1).toLong
      }
    }
    f(c.cast("double"))
  }

  /** Both keys' quantile cut points from ONE sketch pass (the
    * multi-column approxQuantile overload), error scaled to the bucket
    * width — tighter is wasted (a row moving one curve cell is harmless)
    * and the GK summary cost scales with 1/ε.
    */
  private def rankBounds(df: DataFrame, a: Column, b: Column,
      buckets: Int): (Array[Double], Array[Double]) = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val both = df.select(a.cast("double").as("__za"), b.cast("double").as("__zb"))
      .stat.approxQuantile(Array("__za", "__zb"), probs, 1.0 / (4.0 * buckets))
    (both(0).distinct.sorted, both(1).distinct.sorted)
  }

  /** Raw 32-bit Morton interleave of two ≤16-bit non-negative values —
    * the bit kernel under [[zValue]], exposed for direct verification.
    */
  def interleave(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** The interleaved Z-value of two numeric key columns. Rank buckets need
    * only be monotone in the key — small quantile-edge shifts move a row
    * one curve cell, never off the curve. Default 64 buckets/key = 4096
    * curve cells: locality down to ~1/64 of each key range, far finer than
    * any practical file count, while the binary-search bucket UDF stays
    * O(log buckets) per row and the sketch pass stays one job (bucket
    * count only changes cut-point volume, not plan shape).
    */
  def zValue(df: DataFrame, a: Column, b: Column, buckets: Int = 64): Column = {
    val (ba, bb) = rankBounds(df, a, b, buckets)
    interleave(bucketExpr(a, ba), bucketExpr(b, bb))
  }

  /** Lay `df` out on the Morton curve of (a, b): range-repartition +
    * sort by z-value. Writing the result yields files min/max-narrow on
    * BOTH keys. (Range boundaries here only affect file balance, never
    * row values — unlike GlobalRank there is no cross-pass consistency
    * requirement, so repartitionByRange is fine.)
    */
  def layout(df: DataFrame, a: Column, b: Column,
      numFiles: Int, buckets: Int = 64): DataFrame = {
    val z = zValue(df, a, b, buckets)
    df.withColumn("__zv", z)
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
  }

  // ---- incremental append under a FROZEN layout (the lakehouse
  //      OPTIMIZE-once-append-forever pattern, mirroring
  //      SimilaritySearch.appendToIvfIndex's frozen-quantizer contract):
  //      the layout's rank bounds and file z-spans persist as an
  //      artifact; new batches bucket against the frozen artifact with
  //      map-only binary searches and ONE shuffle on the file id — no
  //      rescan or re-sort of history, and appended files share the
  //      existing span structure so multi-key pruning keeps working
  //      across old and new files alike (ZOrderSpec pins both). ----

  /** Frozen layout metadata: per-key rank cut points + per-file z-value
    * cut points. Megabyte-scale regardless of data size.
    */
  final case class LayoutMeta(boundsA: Array[Double], boundsB: Array[Double],
      fileBounds: Array[Double])

  /** Build the artifact from the corpus (one sketch pass per dimension
    * family + one for the z-distribution).
    */
  def layoutMeta(df: DataFrame, a: Column, b: Column,
      numFiles: Int, buckets: Int = 64): LayoutMeta = {
    val (ba, bb) = rankBounds(df, a, b, buckets)
    val z = interleave(bucketExpr(a, ba), bucketExpr(b, bb))
    val probs = (1 until numFiles).map(_.toDouble / numFiles).toArray
    val fb = df.select(z.cast("double").as("__zv"))
      .stat.approxQuantile("__zv", probs, 1.0 / (4.0 * numFiles))
      .distinct.sorted
    LayoutMeta(ba, bb, fb)
  }

  /** Deterministic file id of each row under the frozen meta. */
  def fileIdUnder(meta: LayoutMeta, a: Column, b: Column): Column =
    bucketExpr(
      interleave(bucketExpr(a, meta.boundsA), bucketExpr(b, meta.boundsB))
        .cast("double"),
      meta.fileBounds)

  /** Append a new batch under the frozen layout: map-only bucket
    * assignment, one shuffle on the file id, per-file sort — history
    * untouched.
    */
  def appendToLayout(newDf: DataFrame, meta: LayoutMeta,
      a: Column, b: Column): DataFrame = {
    val z = interleave(bucketExpr(a, meta.boundsA), bucketExpr(b, meta.boundsB))
    newDf.withColumn("__fid", fileIdUnder(meta, a, b))
      .withColumn("__zv", z)
      .repartition(col("__fid"))
      .sortWithinPartitions(col("__fid"), col("__zv"))
      .drop("__zv")
  }

  /** Persist / load the artifact as parquet (kind, idx, value rows). */
  def saveLayoutMeta(spark: org.apache.spark.sql.SparkSession,
      meta: LayoutMeta, dir: String): Unit = {
    import spark.implicits._
    val rows =
      meta.boundsA.zipWithIndex.map { case (v, i) => ("a", i, v) } ++
        meta.boundsB.zipWithIndex.map { case (v, i) => ("b", i, v) } ++
        meta.fileBounds.zipWithIndex.map { case (v, i) => ("f", i, v) }
    rows.toSeq.toDF("kind", "idx", "value")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def loadLayoutMeta(spark: org.apache.spark.sql.SparkSession,
      dir: String): LayoutMeta = {
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    def part(k: String) =
      rows.filter(_._1 == k).sortBy(_._2).map(_._3)
    LayoutMeta(part("a"), part("b"), part("f"))
  }
}
