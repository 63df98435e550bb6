package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-exact power iteration: the leading two eigenvectors of the
  * exact centered gram of a quantized vector corpus, with every reduction
  * routed through the Exact decimal boundary — so the ENTIRE iterative
  * eigen-solve (gram build, matvecs, normalizations, deflation) replays
  * bit-for-bit in DuckDB SQL. This is the oracle-able twin of
  * [[MlOps.pca]]'s MLlib path, the same production/exact split as
  * `vx_semdedup_quantized` vs `vx_semdedup_kmeans` — extended from k-means
  * assignment to iterative LINEAR ALGEBRA.
  *
  * Exactness argument, stage by stage:
  *  - centering without rationals: y = n·x_q − S_j (n = corpus count,
  *    S_j = column sum) is an exact integer; its gram is n² × the centered
  *    covariance, so eigenVECTORS are unchanged;
  *  - the gram accumulates integer products through DECIMAL(38,0) — exact
  *    under any partitioning — then makes ONE deterministic double rounding
  *    (cast) and ONE exact scaling division (/ 2^50);
  *  - each matvec/norm sums 64 doubles through DECIMAL(38,18) (the
  *    engine-wide order-insensitive dsum convention); sqrt and division are
  *    IEEE-exactly-rounded, hence identical cross-engine;
  *  - deflation G₂ = G − λ₁ v₁v₁ᵀ is per-element double arithmetic — no
  *    sums, deterministic;
  *  - projections are reported SQUARED, which removes the eigenvector sign
  *    indeterminacy without any sign-fixing convention.
  *
  * Fixed iteration count (no convergence test): both engines run exactly
  * `iters` rounds, so the outputs are identical whether or not the iterate
  * has converged; the SPEC carries the quality claim (Rayleigh quotient vs
  * MLlib's λ₁) while the oracle carries exactness.
  *
  * Scale shape: the corpus-sized work is the column-sum pass and the gram
  * build; the 64-row iteration plan is data-independent. Collects are
  * bounded: one scalar (n) plus the d²-row gram.
  *
  * Gram-build cost model (verified via the executed plan): the self-join
  * explodes n·d² rows, but the partial `HashAggregate` sits DIRECTLY above
  * the join, below the only Exchange — so the explode is map-side compute
  * folded into d² partial sums per partition, and the shuffle carries
  * partitions × d² rows, never n·d². The real bounds are therefore (a)
  * O(n·d²) per-partition multiply-accumulate work and (b) a d²-group
  * partial-agg hash table per task (4M groups at d=2048 — spill
  * territory). Both are inherent to ANY exact gram; `leadingTwoLocal`
  * enforces d ≤ 256 (a 64 KB-group hash table, measured 34 s at
  * n=50k/d=64), and the reference's d=2048 embeddings belong on the
  * float MLlib path ([[MlOps.pca]]) that this module exists to twin, not
  * replace.
  */
object PowerIter {

  /** 2^50 — the gram pre-scaling that keeps every downstream decimal cast
    * in range; a power of two, so the double division is exact. */
  val GramScale: Double = 1125899906842624.0

  private def dsum18(c: Column): Column =
    sum(c.cast(DecimalType(38, 18))).cast(DoubleType)

  /** `lf`: (vec_id, pos, q) quantized integer components, 0-based pos over
    * `dim` dimensions. Returns (eigs, lam1, lam2) where `eigs` has one row
    * per (comp ∈ {1,2}, i) with the unit eigenvector component `x`, and the
    * lambdas are the final matvec norms in gram-scaled units.
    */
  /** Returns (eigs: (comp, i, x), lams: (comp, nn)) as LOCAL relations.
    *
    * Materialization discipline: the gram is a d²-row bounded relation —
    * collected once (like the IVF centers) and re-injected as a local
    * relation, and each iteration round collects its 64-row iterate and
    * rebuilds from values. Without this the lazy plan references each
    * round's matvec twice (norm + divide) and the tree doubles per round —
    * 2^iters subtree copies re-deriving the corpus gram. The decimal-cast
    * reductions still run through Catalyst (a driver-side reimplementation
    * of Spark's double→decimal rounding would be a parity hazard).
    */
  def leadingTwo(lf: DataFrame, dim: Int, iters: Int)
      : (DataFrame, DataFrame) = {
    val spark = lf.sparkSession
    import spark.implicits._
    val (eigs, lams) = leadingTwoLocal(lf, dim, iters)
    (eigs.toDF("comp", "i", "x"), lams.toDF("comp", "nn"))
  }

  /** [[leadingTwo]] returning plain local collections — the memoizable
    * artifact form (the solve is build-once per corpus; consumers re-inject
    * the 2×dim values as local relations).
    */
  def leadingTwoLocal(lf: DataFrame, dim: Int, iters: Int)
      : (Seq[(Int, Int, Double)], Seq[(Int, Double)]) = {
    // d-bound, not a tuning knob: the gram's map-side partial agg keeps a
    // d²-group hash table per task and the explode does O(n·d²) local
    // work (see the cost model in the object scaladoc); past ~256 dims
    // the exact decimal path stops being the right tool — use the float
    // MLlib twin for wide embeddings.
    require(dim <= 256,
      s"exact gram is bounded to dim <= 256 (got $dim); use MlOps.pca for wide embeddings")
    val spark = lf.sparkSession
    import spark.implicits._
    val n = lf.select(col("vec_id")).distinct().count()
    val y = centered(lf, n)
    // exact integer gram through DECIMAL(38,0), one rounding, one exact /2^50.
    // Each factor is cast to DECIMAL(19,0) BEFORE the multiply: y ≈ n·q grows
    // with corpus size, and a LongType product would wrap silently past ~3e5
    // vectors while the DuckDB replay stays exact in HUGEINT.
    val yA = col("a.y").cast(DecimalType(19, 0))
    val yB = col("b.y").cast(DecimalType(19, 0))
    val gRows = y.as("a").join(y.as("b"), "vec_id")
      .groupBy(col("a.pos").as("i"), col("b.pos").as("j"))
      .agg((sum((yA * yB).cast(DecimalType(38, 0)))
        .cast(DoubleType) / lit(GramScale)).as("gd"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    require(gRows.length == dim * dim, s"gram has ${gRows.length} entries")

    def iterate(gram: Seq[(Int, Int, Double)]): (Seq[(Int, Double)], Double) = {
      val gLocal = gram.toDF("i", "j", "gd")
      var v: Seq[(Int, Double)] = (0 until dim).map(i => (i, 1.0))
      var lam = 0.0
      for (_ <- 1 to iters) {
        val vDf = v.toDF("vi", "x")
        val mv = gLocal.join(vDf, gLocal("j") === vDf("vi"))
          .groupBy(gLocal("i").as("i"))
          .agg(dsum18(col("gd") * col("x")).as("x"))
        val nrm = mv.agg(sqrt(dsum18(col("x") * col("x"))).as("nn"))
        val out = mv.crossJoin(broadcast(nrm))
          .select(col("i"), (col("x") / col("nn")).as("x"), col("nn"))
          .collect()
        v = out.map(r => (r.getInt(0), r.getDouble(1))).toSeq.sortBy(_._1)
        lam = out.head.getDouble(2)
      }
      (v, lam)
    }

    val (v1, lam1) = iterate(gRows.toSeq)
    // deflation: per-element double arithmetic, no sums
    val v1m = v1.toMap
    val g2 = gRows.map { case (i, j, gd) =>
      (i, j, gd - lam1 * v1m(i) * v1m(j))
    }
    val (v2, lam2) = iterate(g2.toSeq)

    val eigs = v1.map { case (i, x) => (1, i, x) } ++
      v2.map { case (i, x) => (2, i, x) }
    (eigs, Seq((1, lam1), (2, lam2)))
  }

  /** Exact integer centering: y = n·q − S_pos. */
  private[graft] def centered(lf: DataFrame, n: Long): DataFrame = {
    val csum = lf.groupBy(col("pos")).agg(sum(col("q")).as("s"))
    lf.join(csum, "pos")
      .select(col("vec_id"), col("pos"),
        (lit(n) * col("q").cast("long") - col("s")).as("y"))
  }

  /** Squared projections of selected vectors onto the two leading
    * eigenvectors (sign-free), plus the scaled lambdas — the gate relation.
    */
  def projectSquared(lf: DataFrame, dim: Int, iters: Int,
      idFilter: Column): DataFrame =
    projectSquaredWith(lf, leadingTwoLocal(lf, dim, iters), idFilter)

  /** [[projectSquared]] against a precomputed (memoized) solve — times the
    * recurring scoring pass, not the build-once eigen-solve.
    */
  def projectSquaredWith(lf: DataFrame,
      solve: (Seq[(Int, Int, Double)], Seq[(Int, Double)]),
      idFilter: Column): DataFrame = {
    val n = lf.select(col("vec_id")).distinct().count()
    scoreSquared(centered(lf, n).filter(idFilter), solve)
  }

  /** Out-of-sample squared projections — the exact-twin form of
    * [[Reduce2d.full]]'s PCA extension: the basis AND the centering
    * statistics (n, column sums) come from the LANDMARK subset only, and
    * every selected row — landmark or not — projects through that frozen
    * model map-only (one broadcast of 2×dim doubles, zero extra
    * shuffles). `solve` must be the landmark fit
    * (`leadingTwoLocal(lf.filter(landmarkFilter), …)`); passing a
    * full-corpus solve silently scores against the wrong model.
    */
  def projectSquaredOutOfSample(lf: DataFrame, landmarkFilter: Column,
      solve: (Seq[(Int, Int, Double)], Seq[(Int, Double)]),
      idFilter: Column): DataFrame = {
    val lm = lf.filter(landmarkFilter)
    val n = lm.select(col("vec_id")).distinct().count()
    val csum = lm.groupBy(col("pos")).agg(sum(col("q")).as("s"))
    val y = lf.join(csum, "pos")
      .select(col("vec_id"), col("pos"),
        (lit(n) * col("q").cast("long") - col("s")).as("y"))
      .filter(idFilter)
    scoreSquared(y, solve)
  }

  private def scoreSquared(y: DataFrame,
      solve: (Seq[(Int, Int, Double)], Seq[(Int, Double)])): DataFrame = {
    val spark = y.sparkSession
    import spark.implicits._
    val (eigs, lams) = (solve._1.toDF("comp", "i", "x"),
      solve._2.toDF("comp", "nn"))
    y.join(eigs, y("pos") === eigs("i"))
      .groupBy(col("vec_id"), col("comp"))
      .agg(dsum18(col("y").cast("double") * col("x")).as("s"))
      .join(lams, "comp")
      .select(col("vec_id"), col("comp"),
        floor(col("s") * col("s")).cast("long").as("proj2_q"),
        floor(col("nn") * lit(1000000.0)).cast("long").as("lam_q"))
  }
}
