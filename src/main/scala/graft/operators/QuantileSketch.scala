package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch (the KLL compactor scheme of Karnin, Lang &
  * Liberty 2016, deterministic variant) — the RANK-QUERY member of the
  * sketch family: [[TopKSketch]] answers "heaviest keys", [[CmsSketch]]
  * answers "this key's count", this answers "the value at rank q·N" in
  * O(k·log(n/k)) doubles of state regardless of n.
  *
  * Structure: a stack of levels; an item at level i carries weight 2^i.
  * New items append to level 0; when a level exceeds k items it is
  * sorted and every second item is promoted to the next level (weight
  * doubles), alternating which parity survives via a per-level flip bit
  * so consecutive compactions cancel rather than compound their rank
  * bias. Each compaction moves every surviving item's rank by at most
  * its weight, which telescopes to the classic O(N/k·log) worst-case
  * rank error; QuantileSketchSpec pins the measured bound (≤ 2% of N at
  * k=256) on real data under adversarial partitionings and orderings.
  *
  * EXACT REGIME: until level 0 overflows (n ≤ k across all partials),
  * no compaction ever fires and the sketch IS the dataset — quantile
  * answers are exact and cross-engine replayable, which is what the
  * full-oracle gate query pins (same design as [[TopKSketch]]'s
  * exact-regime oracle). Past k items answers are approximate, and —
  * unlike CMS's additive merge — the result depends on the merge tree,
  * so only error bounds are contracted, never bit-equality.
  *
  * Rank convention (shared with the SQL oracle): `quantile(q)` = the
  * smallest value v whose weighted rank (total weight of items ≤ v)
  * reaches q·N — the `min(x) WHERE cume_dist >= q` form every SQL engine
  * can replay.
  *
  * 100 TB shape: map-side partial per task, one O(k·log) row per task
  * reaches the shuffle; the finished sketch is a persistable ARRAY<
  * ARRAY<DOUBLE>> artifact (level index = weight exponent) that unions
  * across days/partitions like the HLL and CMS artifacts.
  */
object QuantileSketch {

  /** levels(i) = items of weight 2^i (unsorted between compactions);
    * flips(i) = which parity survives level i's next compaction.
    */
  private[graft] final case class Buf(
      levels: Vector[Vector[Double]], flips: Vector[Boolean])

  private[graft] val empty = Buf(Vector(Vector.empty), Vector(false))

  /** Compact any level holding more than k items, cascading upward. */
  private[graft] def compact(b: Buf, k: Int): Buf = {
    var levels = b.levels
    var flips = b.flips
    var i = 0
    while (i < levels.length) {
      if (levels(i).length > k) {
        val sorted = levels(i).sorted
        // only an even count compacts exactly (2m items of weight w → m
        // of weight 2w); an odd straggler — the max — stays behind so
        // total weight is conserved to the unit (spec-pinned)
        val (toCompact, leftover) =
          if (sorted.length % 2 == 0) (sorted, Vector.empty[Double])
          else (sorted.init, Vector(sorted.last))
        val keepOdd = flips(i)
        val survivors = toCompact.zipWithIndex
          .collect { case (v, idx) if (idx % 2 == 1) == keepOdd => v }
        if (i + 1 >= levels.length) {
          levels = levels :+ Vector.empty[Double]
          flips = flips :+ false
        }
        levels = levels
          .updated(i, leftover)
          .updated(i + 1, levels(i + 1) ++ survivors)
        flips = flips.updated(i, !keepOdd)
      }
      i += 1
    }
    Buf(levels, flips)
  }

  private[graft] def insert(b: Buf, x: Double, k: Int): Buf =
    compact(Buf(b.levels.updated(0, b.levels(0) :+ x), b.flips), k)

  /** Merge = levelwise concatenation, then cascade compactions. Total
    * weight is conserved exactly; rank error adds per compaction only.
    */
  private[graft] def mergeBufs(a: Buf, b: Buf, k: Int): Buf = {
    val n = math.max(a.levels.length, b.levels.length)
    val levels = Vector.tabulate(n) { i =>
      a.levels.applyOrElse(i, (_: Int) => Vector.empty[Double]) ++
        b.levels.applyOrElse(i, (_: Int) => Vector.empty[Double])
    }
    val flips = Vector.tabulate(n)(i =>
      a.flips.applyOrElse(i, (_: Int) => false))
    compact(Buf(levels, flips), k)
  }

  /** Weighted (value, weight) pairs of an artifact, value-sorted. */
  private[graft] def weighted(levels: Seq[Seq[Double]]): Seq[(Double, Long)] =
    levels.zipWithIndex
      .flatMap { case (lvl, i) => lvl.map(v => (v, 1L << i)) }
      .sortBy(_._1)

  /** quantile(q) = smallest v with rank(v) ≥ ceil(q·N), rank = total
    * weight ≤ v. NaN on an empty sketch.
    */
  def quantile(levels: Seq[Seq[Double]], q: Double): Double = {
    val w = weighted(levels)
    val n = w.map(_._2).sum
    if (n == 0L) Double.NaN
    else {
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      w.find { case (_, wt) => cum += wt; cum >= target }
        .map(_._1).getOrElse(w.last._1)
    }
  }

  /** Exact-arithmetic rank of v in the artifact: total weight ≤ v. */
  def rankOf(levels: Seq[Seq[Double]], v: Double): Long =
    weighted(levels).takeWhile(_._1 <= v).map(_._2).sum

  private final class Kll(k: Int)
      extends Aggregator[Double, Buf, Seq[Seq[Double]]] {
    def zero: Buf = empty
    // NaN is excluded, not ranked: a NaN inside a level would poison the
    // compaction sort (IEEE NaN breaks total order) and no rank
    // convention places it; matches SQL aggregates ignoring NULL
    def reduce(b: Buf, x: Double): Buf =
      if (x.isNaN) b else insert(b, x, k)
    def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, k)
    def finish(b: Buf): Seq[Seq[Double]] = b.levels
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[Seq[Double]]] =
      ExpressionEncoder[Seq[Seq[Double]]]()
  }

  /** `kll_sketch(expr)`: the level stack of a numeric column as one
    * ARRAY<ARRAY<DOUBLE>> — the persistable artifact; query it with
    * [[quantile]]/[[rankOf]], union artifacts with [[unionSketch]].
    */
  def sketch(c: Column, k: Int = 256): Column =
    udaf(new Kll(k), ExpressionEncoder[Double]())(c.cast("double"))

  private final class KllUnion(k: Int)
      extends Aggregator[Seq[Seq[Double]], Buf, Seq[Seq[Double]]] {
    def zero: Buf = empty
    def reduce(b: Buf, art: Seq[Seq[Double]]): Buf =
      mergeBufs(b, Buf(art.map(_.toVector).toVector,
        Vector.fill(art.length)(false)), k)
    def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, k)
    def finish(b: Buf): Seq[Seq[Double]] = b.levels
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[Seq[Double]]] =
      ExpressionEncoder[Seq[Seq[Double]]]()
  }

  /** `kll_union(artifact)`: fold already-built sketches (one per
    * day/source/shard) into one — same error class as sketching the
    * concatenated data (spec-pinned).
    */
  def unionSketch(c: Column, k: Int = 256): Column =
    udaf(new KllUnion(k), ExpressionEncoder[Seq[Seq[Double]]]())(c)
}
