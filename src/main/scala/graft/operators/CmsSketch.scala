package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed mergeable
  * Aggregator — the POINT-QUERY member of the sketch family:
  * [[TopKSketch]] answers "what are the heavy hitters", CMS answers "how
  * often did THIS key occur" for any key, in `d × w` longs of state
  * regardless of key cardinality. est(x) = min over the d rows of the
  * counter at h_i(x); the one-sided bound est ≥ true always holds, and
  * est ≤ true + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Unlike SpaceSaving, the CMS merge is PLAIN ELEMENTWISE ADDITION —
  * exactly associative and commutative in integer arithmetic — so the
  * final sketch is BIT-IDENTICAL under any partitioning or merge order
  * (property-pinned). That makes the estimates a deterministic artifact
  * of (corpus, hash family, d, w): reproducible across runs, cacheable,
  * and comparable across days. The hash family is one polynomial
  * code-point hash PER ROW (distinct odd multiplier 31+2r, mod 2^31−1 —
  * [[bucketOf]]): rows are genuinely different hash functions, so two
  * items colliding in one row do not collide in the others (the
  * single-base murmur+mix scheme it replaces had a ~2^-32 per-pair
  * collision floor shared by ALL rows), and the scheme is SQL-replayable
  * — the t_cms_word_freq gate carries a FULL DuckDB oracle that rebuilds
  * the d×w grid cell-for-cell (graft.queries.Exact.POLYHASH).
  *
  * 100 TB shape: each map task folds rows into its own d×w table
  * (map-side combine), and exactly ONE d·w-long row per partition reaches
  * the shuffle — the same bounded-state profile as the other sketches.
  */
object CmsSketch {

  /** Row-r hash of an item into [0, w): polynomial code-point hash with
    * per-row odd multiplier 31+2r, reduced mod 2^31−1 each step (every
    * intermediate < 2^38 — overflow-safe in Spark longs and DuckDB
    * BIGINTs alike). Each row is a structurally different polynomial, so
    * row collisions are independent; SQL twin =
    * `graft.queries.Exact.POLYHASH(s"31 + 2*r", item) % w`.
    */
  private[graft] def bucketOf(item: String, row: Int, w: Int): Int = {
    val m = 31L + 2L * row
    var h = 0L
    var i = 0
    while (i < item.length) {
      val cp = item.codePointAt(i)
      h = (h * m + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    (h % w).toInt
  }

  /** Flat d×w table; index (row, bucket) = row * w + bucket. */
  private[graft] def cmsInsert(t: Array[Long], item: String, d: Int, w: Int,
      n: Long = 1L): Array[Long] = {
    var i = 0
    while (i < d) { t(i * w + bucketOf(item, i, w)) += n; i += 1 }
    t
  }

  private[graft] def cmsEstimate(t: Array[Long], item: String, d: Int,
      w: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val v = t(i * w + bucketOf(item, i, w))
      if (v < best) best = v
      i += 1
    }
    best
  }

  private final class Cms(d: Int, w: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {

    def zero: Array[Long] = new Array[Long](d * w)

    def reduce(t: Array[Long], item: String): Array[Long] =
      cmsInsert(t, item, d, w)

    // elementwise sum — exactly associative, the property that makes the
    // sketch bit-identical under any partitioning
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(t: Array[Long]): Array[Long] = t

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** `cms_sketch(expr)`: the d×w count table of a (string-castable)
    * column as one ARRAY<BIGINT> — the persistable sketch artifact;
    * query it with [[cmsEstimate]] (or [[estimates]] for a relational
    * view). Defaults give ε ≈ 0.0027, δ ≈ 2% (w=1024, d=4).
    */
  def sketch(c: Column, d: Int = 4, w: Int = 1024): Column =
    udaf(new Cms(d, w), ExpressionEncoder[String]())(c.cast("string"))

  /** Point estimates for `keys` against a built sketch (driver-side
    * artifact math — the sketch is d·w longs, not data-scale).
    */
  def estimates(table: Array[Long], keys: Seq[String], d: Int = 4,
      w: Int = 1024): Seq[(String, Long)] =
    keys.map(k => k -> cmsEstimate(table, k, d, w))
}
