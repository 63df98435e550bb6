package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregators for vector columns (SURVEY.md §2.11): the scalable path
  * for per-group vector math. Unlike collect_list-based forms, these buffers
  * are O(D) per group and merge associatively, so Spark runs them with
  * map-side partial aggregation — one shuffled row per (group) per partition,
  * not one per input row. That is the property that matters at 100 TB.
  */
object VecAgg {

  /** Elementwise sum + count → mean vector. The reference's global-average
    * pool / centroid (A1, src/compare_xception_featuremaps.py:39-41) in
    * aggregate form.
    */
  private final class MeanVec extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      while (i < v.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    }
    def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** mean_vec(embedding): ARRAY<FLOAT> → ARRAY<DOUBLE> group mean. */
  def meanVec(c: Column): Column = meanVecUdaf(c)
  private lazy val meanVecUdaf =
    udaf(new MeanVec, ExpressionEncoder[Seq[Float]]())

  /** Elementwise sum (no final division). For scale-invariant consumers
    * (cosine) the sum vector is interchangeable with the mean, and over
    * integer-quantized inputs every intermediate stays an exact integer —
    * the property the cross-engine oracle for `vx_fast_centroid_cosine`
    * relies on. Same O(D) map-side-combinable buffer as MeanVec.
    */
  private final class SumVec extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      val acc = if (b.isEmpty) new Array[Double](v.length) else b
      var i = 0
      while (i < v.length) { acc(i) += v(i); i += 1 }
      acc
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    }
    def finish(r: Array[Double]): Seq[Double] = r.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** sum_vec(embedding): ARRAY<FLOAT> → ARRAY<DOUBLE> elementwise group sum. */
  def sumVec(c: Column): Column = sumVecUdaf(c)
  private lazy val sumVecUdaf =
    udaf(new SumVec, ExpressionEncoder[Seq[Float]]())

  /** Linear-CKA sufficient statistics between two vector spaces paired on the
    * same rows (A5, src/compare_xception_featuremaps.py:50-62).
    *
    * Uses the identity: for column-centered X [n,p], Y [n,q],
    *   CKA = ||Xᵀ Y||²_F / (||Xᵀ X||_F · ||Yᵀ Y||_F).
    * The buffer accumulates the uncentered moments Σx, Σy, ΣxᵀX (p×p), ΣyᵀY
    * (q×q), ΣxᵀY (p×q) and n — all associative sums, so the aggregation is
    * map-side-combinable with an O(p·q) buffer independent of n. Centering is
    * applied algebraically in finish(): XcᵀYc = ΣxᵀY − (Σx)(Σy)ᵀ/n, etc.
    * Bound p,q (GAP'd channel counts ≤ ~2048) per SURVEY.md §7.3.
    */
  final case class CkaBuf(
      n: Long,
      sx: Array[Double], sy: Array[Double],
      xx: Array[Double], yy: Array[Double], xy: Array[Double])

  private final class Cka extends Aggregator[(Seq[Float], Seq[Float]), CkaBuf, Double] {
    def zero: CkaBuf = CkaBuf(0L, Array.emptyDoubleArray, Array.emptyDoubleArray,
      Array.emptyDoubleArray, Array.emptyDoubleArray, Array.emptyDoubleArray)
    def reduce(b: CkaBuf, v: (Seq[Float], Seq[Float])): CkaBuf = {
      val (x, y) = v
      val p = x.length; val q = y.length
      val b2 = if (b.n == 0L)
        CkaBuf(0L, new Array[Double](p), new Array[Double](q),
          new Array[Double](p * p), new Array[Double](q * q), new Array[Double](p * q))
      else b
      var i = 0
      while (i < p) { b2.sx(i) += x(i); i += 1 }
      var j = 0
      while (j < q) { b2.sy(j) += y(j); j += 1 }
      i = 0
      while (i < p) {
        val xi = x(i).toDouble
        var k = 0
        while (k < p) { b2.xx(i * p + k) += xi * x(k); k += 1 }
        k = 0
        while (k < q) { b2.xy(i * q + k) += xi * y(k); k += 1 }
        i += 1
      }
      j = 0
      while (j < q) {
        val yj = y(j).toDouble
        var k = 0
        while (k < q) { b2.yy(j * q + k) += yj * y(k); k += 1 }
        j += 1
      }
      b2.copy(n = b2.n + 1)
    }
    def merge(a: CkaBuf, b: CkaBuf): CkaBuf = {
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        def addInto(x: Array[Double], y: Array[Double]): Array[Double] = {
          var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
        }
        CkaBuf(a.n + b.n, addInto(a.sx, b.sx), addInto(a.sy, b.sy),
          addInto(a.xx, b.xx), addInto(a.yy, b.yy), addInto(a.xy, b.xy))
      }
    }
    def finish(r: CkaBuf): Double = {
      if (r.n < 2) return 0.0
      val n = r.n.toDouble
      val p = r.sx.length; val q = r.sy.length
      // ||XcᵀYc||²_F = Σ_ik (xy[i,k] − sx[i]·sy[k]/n)²  etc.
      var num = 0.0
      var i = 0
      while (i < p) {
        var k = 0
        while (k < q) { val c = r.xy(i * q + k) - r.sx(i) * r.sy(k) / n; num += c * c; k += 1 }
        i += 1
      }
      var dx = 0.0
      i = 0
      while (i < p) {
        var k = 0
        while (k < p) { val c = r.xx(i * p + k) - r.sx(i) * r.sx(k) / n; dx += c * c; k += 1 }
        i += 1
      }
      var dy = 0.0
      var j = 0
      while (j < q) {
        var k = 0
        while (k < q) { val c = r.yy(j * q + k) - r.sy(j) * r.sy(k) / n; dy += c * c; k += 1 }
        j += 1
      }
      val denom = math.sqrt(dx) * math.sqrt(dy)
      if (denom <= 0.0) 0.0 else num / denom
    }
    def bufferEncoder: Encoder[CkaBuf] = Encoders.product[CkaBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** cka(x, y): paired ARRAY<FLOAT> columns → linear CKA similarity ∈ [0,1]. */
  def cka(x: Column, y: Column): Column = ckaUdaf(x, y)
  private lazy val ckaUdaf =
    udaf(new Cka, ExpressionEncoder[(Seq[Float], Seq[Float])]())
}
