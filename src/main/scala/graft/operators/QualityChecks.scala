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
    df.groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).cast("long").as("diversity"),
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
    require(l >= 2, s"l must be >= 2, got $l")
    val classes = df
      .groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).cast("long").as("diversity"))
      .filter(col("diversity") < l)
    df.select(col(idCol) +: quasiIds.map(col): _*)
      .join(classes, quasiIds)
      .select(col(idCol), col("diversity"))
  }
}
