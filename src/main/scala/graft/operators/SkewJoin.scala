package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY.md §4.3): salt the skewed (large) side's
  * key with a deterministic 0..n-1 suffix and explode the build side n×, so
  * one hot key spreads over n shuffle partitions instead of hot-spotting one.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins whose
  * skew is visible at runtime; this explicit form is for when the skew is
  * known a priori (e.g. a head-heavy group key in a 100 TB fact table) or
  * when the join must be shuffled-hash. Salt factor trades build-side
  * duplication (n×) for parallelism on the probe side.
  */
object SkewJoin {

  def saltedEquiJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit each unmatched small-side row saltFactor
    // times (one per exploded salt copy) — wrong duplicate multiplicity.
    // The large (salted) side's multiplicity is unaffected, so inner/left/
    // left_semi/left_anti (all emitting only large-side rows, each salted
    // exactly once) are the sound shapes: a large row's (key, salt) has a
    // small-side match iff the bare key matches, since the small side is
    // exploded with EVERY salt value.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(normalized),
      s"saltedEquiJoin supports inner/left/left_semi/left_anti join types, got $joinType")
    // deterministic salt: spread rows of a hot key by a hash of the whole
    // row (monotonically_increasing_id would break retry determinism)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(saltFactor.toLong)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Bloom-filtered semi-join: membership-prune the large side BEFORE the
    * exact semi-join shuffles it. The small side's keys build a Bloom
    * filter (~10 bits/key at 1% FPR — far smaller than a broadcast hash
    * set at large key counts); the large side filters map-side and only
    * true matches plus the FPR sliver reach the exact join, which removes
    * false positives — output is exactly `large SEMI JOIN small`. The
    * explicit form of the runtime row-level filtering Spark injects only
    * for some shuffle-join shapes; here the prune is guaranteed.
    */
  def bloomSemiJoin(large: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(key)).distinct()
    val expected = math.max(keys.count(), 1L)
    val bloom = keys.stat.bloomFilter(key, expected, fpp)
    val mightContain = udf((k: Any) => k != null && bloom.mightContain(k))
    large.filter(mightContain(col(key)))
      .join(keys, Seq(key), "left_semi")
  }

  /** Key-distribution profile — the measurement that DECIDES whether a join
    * needs salting and with what factor: the `topK` heaviest keys with their
    * row share (ppm) and skew factor (count / mean count per key, in
    * hundredths). skew_x100 ≈ 100 is uniform; a key at 50× the mean is the
    * hot-spot AQE may miss when the join is shuffled-hash or the skew is
    * a priori. One groupBy shuffle on the key; the global totals come from a
    * 1-row broadcast cross join, never a single-partition window. All
    * emitted numbers are exact-double arithmetic (products < 2^53), so the
    * profile is fully oracle-checkable.
    */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__tot"),
      count(lit(1)).as("__n_keys"))
    counts.crossJoin(broadcast(totals))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topK)
      .select(col(keyCol), col("n"),
        floor(col("n").cast("double") * lit(1000000.0) / col("__tot"))
          .cast("long").as("share_ppm"),
        floor(col("n").cast("double") * col("__n_keys") * lit(100.0) / col("__tot"))
          .cast("long").as("skew_x100"))
  }
}
