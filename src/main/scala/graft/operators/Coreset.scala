package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (farthest-point traversal — the
  * 2-approximation of Gonzalez 1985, used as the "Coreset" data-selection
  * baseline in active learning, Sener & Savarese 2018): pick k rows whose
  * embeddings COVER the corpus — every point is within the returned
  * radius of some center — the diversity-maximizing complement of
  * [[SemDedup]] (which REMOVES near-duplicate points, keeping density;
  * this keeps one point per region, discarding density).
  *
  * Algorithm: seed with the minimum-id row (deterministic), then k−1
  * rounds of "broadcast the newest center, one MAP-ONLY pass updates
  * each row's running min-distance-to-centers, TakeOrdered(1) picks the
  * farthest point" (ties by id, so the selection is reproducible across
  * partitionings — spec-pinned). The greedy invariant — selection
  * distances are non-increasing, and every later point sits within the
  * last selection distance of some center — is exactly the
  * 2-approximation certificate, and CoresetSpec re-verifies it from
  * scratch.
  *
  * 100 TB shape: k scans of a cached (id, vector, minDist) projection —
  * each round ships ONE vector in the task closure and reduces to ONE
  * row (TakeOrdered); no shuffle of the corpus, ever; driver state is
  * the k selected vectors. k is dozens by contract (it bounds both the
  * scan count and the closure size), matching the reference's
  * bounded-sample analysis contract
  * (/root/reference/src/analyze_embedding_with_pca.py:117-118 samples
  * per-group on the driver; this is the distributed diversity twin).
  */
object Coreset {

  /** The k selected (id, round, sel_dist2) rows, in selection order.
    * `sel_dist2` = the squared distance from the new center to the
    * nearest previously-selected center at selection time (0 for the
    * seed); it is non-increasing, and its final value bounds every
    * remaining point's distance to the coreset (radius certificate).
    */
  def kCenter(df: DataFrame, k: Int,
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec")).cache()
    try {
      // element-type agnostic (FLOAT[] embeddings or DOUBLE[] quantized
      // twins both work): boxed numerics through doubleValue
      def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
        r.getSeq[Number](1).map(_.doubleValue).toArray
      val seedRows = base.orderBy(col("id")).limit(1)
        .select(col("id"), col("vec")).collect()
      require(seedRows.nonEmpty,
        "kCenter: input DataFrame is empty — need at least one row to seed")
      val seed = seedRows(0)
      var centers = Vector((seed.getLong(0), 0.0))
      var centerVec = vecOf(seed)

      // running min squared distance to the selected set; updated with
      // ONE l2sq against the newest center per round (map-only).
      // localCheckpoint each round: the iterative withColumn chain grows
      // the logical plan linearly, and Catalyst re-analyzes the whole
      // chain per round (the plan blowup measured at 30+ s/round by
      // round 15 of the BPE trainer); truncating lineage keeps every
      // round flat regardless of k.
      var state = base
        .withColumn("minDist", VecOps.l2sq(col("vec"), lit(centerVec)))
        .select(col("id"), col("vec"), col("minDist"))
        .localCheckpoint(true)

      var r = 1
      var covered = false
      while (r < k && !covered) {
        val next = state.orderBy(col("minDist").desc, col("id")).limit(1)
          .collect()(0)
        // farthest remaining point at distance 0 ⇒ every point coincides
        // with a selected center (k exceeds the distinct-vector count):
        // stop instead of re-selecting the same row as a duplicate center
        if (next.getDouble(2) == 0.0) covered = true
        else {
          centers :+= ((next.getLong(0), next.getDouble(2)))
          centerVec = vecOf(next)
          state = state
            .withColumn("minDist", least(col("minDist"),
              VecOps.l2sq(col("vec"), lit(centerVec))))
            .select(col("id"), col("vec"), col("minDist"))
            .localCheckpoint(true)
        }
        r += 1
      }
      centers.zipWithIndex
        .map { case ((id, d2), i) => (id, i.toLong, d2) }
        .toDF("id", "round", "sel_dist2")
    } finally base.unpersist()
  }
}
