package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-form vector math over `ARRAY<FLOAT|DOUBLE>` columns — the fused fast
  * path for the reference's embedding analytics (SURVEY.md §2.7 F6/F7, §2.11).
  *
  * Everything here is Catalyst higher-order functions (`zip_with`,
  * `aggregate`, `transform`), so the math stays inside whole-stage codegen
  * with zero per-element shuffle — unlike the posexplode long form used for
  * DuckDB oracle parity (graft.queries.VectorQueries), which trades a D×
  * row blow-up for cross-engine checkability. Specs assert both forms agree.
  *
  * At 100 TB scale this is the path that matters: a dot product over a
  * 2048-dim embedding is one generated loop per row, not 2048 shuffled rows.
  */
object VecOps {

  /** Σ aᵢ·bᵢ — elementwise product then sum, all in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ vᵢ² */
  def norm2(v: Column): Column = dot(v, v)

  /** L2 norm. */
  def l2norm(v: Column): Column = sqrt(norm2(v))

  /** Cosine similarity with 0-guard (reference eps convention,
    * src/compare_xception_featuremaps.py:50-62 denominator guard).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b) + lit(1e-12))

  /** Squared L2 distance — cheaper than sqrt for nearest-neighbor ranking. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dl = x.cast("double") - y.cast("double"); dl * dl
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Elementwise add — for tree/partial centroid accumulation. */
  def add(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  /** Scale by a scalar column. */
  def scale(v: Column, k: Column): Column =
    transform(v, x => x.cast("double") * k)

  /** Cosine via the native codegen expression (graft.expressions
    * .CosineSimilarity) — no function registration needed: the bridge
    * constructs the Column directly, so it works in ANY session, unlike the
    * `cosine_sim` SQL name which needs GraftExtensions. Prefer this over
    * `cosine` (higher-order functions are CodegenFallback and evict their
    * projection from whole-stage codegen).
    */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CosineSimilarity(expression(a), expression(b)))

  private def expression(c: Column) =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  // Vector mean/sum as a GROUP aggregate lives in
  // graft.operators.VecAgg.meanVec (typed Aggregator, O(D) buffer,
  // map-side combinable) — a collect_list-based form would buffer every
  // group member in memory and is deliberately not offered.
}
