package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint report (the Deequ/
  * great-expectations pattern, Schelter et al. 2018 "Automating
  * Large-Scale Data Quality Verification"): evaluate a set of named
  * row-level predicates over a table in ONE aggregation pass and publish
  * (check, n_rows, n_violations, pass) — the contract gate a pipeline
  * runs before promoting a snapshot.
  *
  * Every check is a conditional count folded into the same map-side
  * partial aggregate, so the report costs one scan regardless of how
  * many constraints it carries; uniqueness checks (not expressible as a
  * row predicate) run as a key-grouped duplicate count and union in —
  * one extra shuffle on the checked key, still payload-free.
  */
object QualityChecks {

  /** One scan, all row-level predicates. `checks` maps check name →
    * predicate that must hold for every row.
    */
  def report(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val n = count(lit(1))
    val aggs = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__v_$name")
    }
    val row = df.agg(n.as("__n"), aggs: _*)
    // unpivot the single summary row into (check, n_rows, n_violations)
    val stacked = checks.map { case (name, _) =>
      struct(lit(name).as("check"), col("__n").as("n_rows"),
        col(s"__v_$name").as("n_violations"))
    }
    row.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check"), col("r.n_rows"), col("r.n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Uniqueness constraint on a key: rows carrying a duplicated key
    * count as violations (all members of a duplicate group, matching
    * the "every row must be uniquely keyed" contract).
    */
  def uniqueCheck(df: DataFrame, name: String, keyCols: Seq[String])
      : DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__n"),
        coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L)).as("__v"))
      .select(lit(name).as("check"), col("__n").as("n_rows"),
        col("__v").as("n_violations"),
        (col("__v") === 0L).as("pass"))

  /** k-anonymity audit over a quasi-identifier tuple (Sweeney 2002): a row
    * is AT RISK when its quasi-identifier equivalence class holds fewer
    * than k rows — the re-identification exposure a dataset release must
    * report alongside PII redaction. Output is the equivalence-class SIZE
    * histogram (`class_size, n_classes, n_rows, at_risk`) — the shape
    * analysts act on — never the quasi-identifier values themselves, so
    * the report is safe to publish even when the classes are not. One
    * groupBy on the tuple + one on the size; payload-free at any scale.
    */
  def kAnonymityReport(df: DataFrame, quasiIds: Seq[String],
      k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "no quasi-identifier columns given")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        (count(lit(1)) * col("class_size")).cast("long").as("n_rows"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** The rows a k-anonymity release would have to suppress or generalize:
    * every member of an equivalence class smaller than k, keyed by the
    * caller's row id so no quasi-identifier leaves the operator.
    */
  def kAnonymityRiskRows(df: DataFrame, quasiIds: Seq[String], k: Long,
      idCol: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val byClass = Window.partitionBy(quasiIds.map(col): _*)
    df.select(col(idCol) +: quasiIds.map(col): _*)
      .withColumn("class_size", count(lit(1)).over(byClass))
      .filter(col("class_size") < k)
      .select(col(idCol), col("class_size").cast("long"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007 "l-Diversity:
    * Privacy Beyond k-Anonymity"): k-anonymity alone cannot stop an
    * attribute-disclosure attack — a class of 50 rows that all share one
    * sensitive value reveals that value for every member. A class is
    * l-diverse when its sensitive attribute takes at least l DISTINCT
    * values; this report is the diversity histogram (`diversity,
    * n_classes, n_rows, at_risk`), payload-free like
    * [[kAnonymityReport]] — neither quasi-identifiers nor sensitive
    * values leave the operator.
    *
    * Shape: two key-grouped exact aggregations — (quasi, sensitive)
    * counts collapse duplicates FIRST (the map-side combine bounds the
    * second shuffle by distinct pairs, not rows), then the per-class
    * rollup; both linear, no window, no all-pairs anything.
    */
  def lDiversityReport(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "no quasi-identifier columns given")
    require(l >= 2, s"l must be >= 2, got $l")
    // NULL is ignorance, not a value: diversity counts distinct NON-NULL
    // sensitive values (COUNT(DISTINCT) semantics — a class of all-NULL
    // rows has diversity 0, not a phantom 1), while class sizes still
    // count every row
    df.groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(quasiIds.map(col): _*)
      .agg(count(when(col(sensitiveCol).isNotNull, lit(1)))
          .cast("long").as("diversity"),
        sum(col("__c")).cast("long").as("__class_size"))
      .groupBy(col("diversity"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("__class_size")).cast("long").as("n_rows"))
      .withColumn("at_risk", col("diversity") < l)
  }

  /** The rows an l-diversity release would have to suppress, generalize,
    * or re-bucket: every member of an equivalence class whose sensitive
    * attribute shows fewer than l distinct values, keyed by the caller's
    * row id. Class diversity computes via the same duplicate-collapsing
    * rollup as [[lDiversityReport]] and joins back on the quasi tuple —
    * a keyed equi-join (broadcast when the class relation is small),
    * never a per-row `collect_set` window whose state would grow with
    * class cardinality.
    */
  def lDiversityRiskRows(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, l: Long, idCol: String): DataFrame = {
    require(quasiIds.nonEmpty, "no quasi-identifier columns given")
    require(l >= 2, s"l must be >= 2, got $l")
    val classes = df
      .groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(quasiIds.map(col): _*)
      .agg(count(when(col(sensitiveCol).isNotNull, lit(1)))
        .cast("long").as("diversity"))
      .filter(col("diversity") < l)
    df.select(col(idCol) +: quasiIds.map(col): _*)
      .join(classes, quasiIds)
      .select(col(idCol), col("diversity"))
  }

  /** Per-class ordered earth-mover's distance to the GLOBAL sensitive
    * distribution, quantized (`floor(emd * 1e6)`) — the t-closeness
    * measure (Li, Li & Venkatasubramanian 2007): l-diversity still leaks
    * when a class's sensitive values are diverse but SKEWED far from the
    * corpus baseline (all low tiers in one nation reveals plenty). For an
    * ordered attribute, EMD = Σ_{j<m} |cumP_j − cumQ_j| / (m−1) over the
    * global value domain v_1 < … < v_m.
    *
    * Exactness discipline: the cumulative sums run over INTEGER counts
    * (exact at any window association order) and divide to doubles once
    * per row, the per-value |cumP − cumQ| terms cross the exact-decimal
    * sum boundary, and the single ÷(m−1) and quantization happen last —
    * so the quantized distance is engine-reproducible, never at the
    * mercy of float summation order. Shape: bounded rollups plus one
    * classes × values grid (classes ≪ rows, m = distinct sensitive
    * values — both bounded for banded attributes); per-class windows
    * over m rows, global side broadcast.
    *
    * Returns one row per class: quasi columns + `class_size` + `emd_q`.
    * [[tClosenessReport]] is the publishable histogram form.
    */
  def tClosenessByClass(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiIds.nonEmpty, "no quasi-identifier columns given")
    // distributions compare over OBSERVED values: NULL sensitive rows
    // drop from both sides (they would break the grid join — NULL never
    // equi-joins — and sort ambiguously across engines); a class of
    // all-NULL rows has no distribution to compare and yields no row
    val obs = df.filter(col(sensitiveCol).isNotNull)
    val gvals = obs.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__gc"))
    val m = gvals.count()
    require(m >= 2,
      s"sensitive attribute has $m distinct value(s); EMD needs >= 2")
    val totals = obs.agg(count(lit(1)).as("__n"))
    val classes = obs.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("__cs"))
    val cvals = obs
      .groupBy((quasiIds.map(col) :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__cc"))
    val w = Window.partitionBy(quasiIds.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes.crossJoin(broadcast(gvals))
      .join(cvals, quasiIds :+ "__v", "left")
      .crossJoin(broadcast(totals))
      .withColumn("__ccc", sum(coalesce(col("__cc"), lit(0L))).over(w))
      .withColumn("__cgc", sum(col("__gc")).over(w))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(quasiIds.map(col): _*).orderBy(col("__v"))))
      .filter(col("__rk") < m) // cum diff at j = m is identically 0
      .withColumn("__d", abs(
        col("__ccc").cast("double") / col("__cs").cast("double") -
        col("__cgc").cast("double") / col("__n").cast("double")))
      .groupBy(quasiIds.map(col): _*)
      .agg(first(col("__cs")).cast("long").as("class_size"),
        floor(sum(col("__d").cast(
            org.apache.spark.sql.types.DecimalType(27, 12)))
          .cast("double") / lit((m - 1).toDouble) * lit(1000000.0))
          .cast("long").as("emd_q"))
  }

  /** The publishable t-closeness audit: the quantized-distance histogram
    * (`emd_q, n_classes, n_rows, at_risk`), payload-free like the
    * k-anonymity and l-diversity reports. A class is at risk when its
    * distance exceeds t (compared in the quantized domain:
    * `emd_q > floor(t * 1e6)`).
    */
  def tClosenessReport(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(t > 0.0 && t < 1.0, s"t must be in (0, 1), got $t")
    tClosenessByClass(df, quasiIds, sensitiveCol)
      .groupBy(col("emd_q"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("class_size")).cast("long").as("n_rows"))
      .withColumn("at_risk", col("emd_q") > math.floor(t * 1e6).toLong)
  }

  /** The rows a t-closeness release would have to generalize or
    * re-partition: members of classes whose distance exceeds t, keyed by
    * the caller's row id — the [[lDiversityRiskRows]] join-back shape.
    */
  def tClosenessRiskRows(df: DataFrame, quasiIds: Seq[String],
      sensitiveCol: String, t: Double, idCol: String): DataFrame = {
    require(t > 0.0 && t < 1.0, s"t must be in (0, 1), got $t")
    val risky = tClosenessByClass(df, quasiIds, sensitiveCol)
      .filter(col("emd_q") > math.floor(t * 1e6).toLong)
      .select(quasiIds.map(col) :+ col("emd_q"): _*)
    df.select(col(idCol) +: quasiIds.map(col): _*)
      .join(risky, quasiIds)
      .select(col(idCol), col("emd_q"))
  }
}
