package graft

import graft.operators.{QualityChecks, TableDiff}
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged correctly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val neu = Seq((2L, "b"), (3L, "C"), (4L, "d"), (5L, "e"))
      .toDF("id", "v")
    val got = TableDiff.diff(old, neu, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
    val sum = TableDiff.summary(old, neu, Seq("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 2L))
  }

  test("null vs empty string cannot collide in the fingerprint") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("")))
      .toDF("id", "v")
    val neu = Seq((1L, Some("")), (2L, Option.empty[String]))
      .toDF("id", "v")
    val got = TableDiff.diff(old, neu, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("multi-column keys and selective compare columns") {
    val old = Seq((1L, 1L, "x", "keep"), (1L, 2L, "y", "keep"))
      .toDF("k1", "k2", "v", "ignored")
    val neu = Seq((1L, 1L, "x", "DIFFERENT"), (1L, 2L, "z", "keep"))
      .toDF("k1", "k2", "v", "ignored")
    val got = TableDiff.diff(old, neu, Seq("k1", "k2"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got == Map((1L, 1L) -> "unchanged", (1L, 2L) -> "changed"))
  }

  test("quality report: one pass, exact violation counts, pass flags") {
    val df = Seq((1L, 10.0), (2L, -5.0), (3L, 0.0), (3L, 7.0))
      .toDF("id", "x")
    val rep = QualityChecks.report(df, Seq(
      "x_positive" -> (col("x") > 0),
      "id_small" -> (col("id") < 100)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep("x_positive") == ((4L, 2L, false)))
    assert(rep("id_small") == ((4L, 0L, true)))
    val uq = QualityChecks.uniqueCheck(df, "id_unique", Seq("id")).collect()(0)
    assert((uq.getLong(1), uq.getLong(2), uq.getBoolean(3)) == ((4L, 2L, false)))
  }

  test("null predicate results count as violations") {
    val df = Seq((1L, Some(5.0)), (2L, Option.empty[Double]))
      .toDF("id", "x")
    val rep = QualityChecks.report(df,
      Seq("x_positive" -> (col("x") > 0))).collect()(0)
    assert(rep.getLong(2) == 1L && !rep.getBoolean(3))
  }

  test("k-anonymity: histogram partitions the table, risk rows = members of small classes") {
    // classes: (a,1)x3, (a,2)x1, (b,1)x2 — with k=3 only the first is safe
    val df = Seq((1L, "a", 1), (2L, "a", 1), (3L, "a", 1),
      (4L, "a", 2), (5L, "b", 1), (6L, "b", 1)).toDF("id", "q1", "q2")
    val hist = QualityChecks.kAnonymityReport(df, Seq("q1", "q2"), k = 3)
      .collect().map(r => r.getAs[Long]("class_size") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Boolean]("at_risk")))).toMap
    assert(hist == Map(1L -> ((1L, 1L, true)), 2L -> ((1L, 2L, true)),
      3L -> ((1L, 3L, false))))
    // histogram row counts sum back to the table
    assert(hist.values.map(_._2).sum == 6L)
    val risky = QualityChecks.kAnonymityRiskRows(df, Seq("q1", "q2"), 3, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(risky == Map(4L -> 1L, 5L -> 2L, 6L -> 2L))
  }

  test("l-diversity: class diversity = distinct sensitive values, risk rows join back") {
    // class (a): sensitive {x,y,z} — diverse; class (b): 3 rows but all
    // sensitive x — k-anonymous at k=3 yet attribute-disclosing;
    // class (c): {x,y} — 2 distinct
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "a", "z"),
      (4L, "b", "x"), (5L, "b", "x"), (6L, "b", "x"),
      (7L, "c", "x"), (8L, "c", "y")).toDF("id", "q", "s")
    val hist = QualityChecks.lDiversityReport(df, Seq("q"), "s", l = 3)
      .collect().map(r => r.getAs[Long]("diversity") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Boolean]("at_risk")))).toMap
    assert(hist == Map(1L -> ((1L, 3L, true)), 2L -> ((1L, 2L, true)),
      3L -> ((1L, 3L, false))))
    // histogram row counts sum back to the table — every row lands in
    // exactly one class
    assert(hist.values.map(_._2).sum == 8L)
    val risky = QualityChecks.lDiversityRiskRows(df, Seq("q"), "s", 3, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(risky == Map(4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 2L, 8L -> 2L))
    // the k-anonymity blind spot: class (b) passes k=3 but fails l=3
    val kSafe = QualityChecks.kAnonymityRiskRows(df, Seq("q"), 3, "id")
      .collect().map(_.getLong(0)).toSet
    assert(!kSafe.contains(4L) && risky.contains(4L))
  }

  test("NULL sensitive values: ignorance, not a value, in both audits") {
    val df = Seq((1L, "d", Option("x")), (2L, "d", None), (3L, "d", None),
      (4L, "e", Option("x")), (5L, "e", Option("y"))).toDF("id", "q", "s")
    // COUNT(DISTINCT) semantics: class (d) has ONE distinct value, not a
    // phantom 2 from the NULL bucket — it must flag at l=2
    val hist = QualityChecks.lDiversityReport(df, Seq("q"), "s", l = 2)
      .collect().map(r => r.getAs[Long]("diversity") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Boolean]("at_risk")))).toMap
    assert(hist == Map(1L -> ((1L, 3L, true)), 2L -> ((1L, 2L, false))))
    val risky = QualityChecks.lDiversityRiskRows(df, Seq("q"), "s", 2, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(risky == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // t-closeness distributions compare over OBSERVED rows: global
    // obs = {x:2, y:1}, class (d) obs {x} cs=1 -> |1 - 2/3| = 1/3;
    // class (e) {x,y} -> |1/2 - 2/3| = 1/6
    val byClass = QualityChecks.tClosenessByClass(df, Seq("q"), "s")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("class_size"), r.getAs[Long]("emd_q")))).toMap
    assert(byClass == Map("d" -> ((1L, 333333L)), "e" -> ((2L, 166666L))))
  }

  test("t-closeness: hand-computed ordered EMD, the diverse-but-skewed class") {
    // all ratios dyadic so every double is exact. Global over the three
    // classes: value counts 1->4, 2->6, 3->6, n=16, Q=(.25,.375,.375),
    // cumQ=(.25,.625).
    //  (a) {1,1,2,3}: cumP=(.5,.75)  -> diffs .25,.125 -> EMD .375/2=.1875
    //  (b) {2,2,3,3}: cumP=(0,.5)    -> diffs .25,.125 -> EMD .1875
    //      — (b) is perfectly 2-diverse yet skewed: the l-diversity miss
    //  (c) = global shape exactly    -> EMD 0
    val df = Seq(
      (1L, "a", 1), (2L, "a", 1), (3L, "a", 2), (4L, "a", 3),
      (5L, "b", 2), (6L, "b", 2), (7L, "b", 3), (8L, "b", 3),
      (9L, "c", 1), (10L, "c", 1), (11L, "c", 2), (12L, "c", 2),
      (13L, "c", 2), (14L, "c", 3), (15L, "c", 3), (16L, "c", 3)
    ).toDF("id", "q", "s")
    val byClass = QualityChecks.tClosenessByClass(df, Seq("q"), "s")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("class_size"), r.getAs[Long]("emd_q")))).toMap
    assert(byClass == Map("a" -> ((4L, 187500L)), "b" -> ((4L, 187500L)),
      "c" -> ((8L, 0L))))
    val hist = QualityChecks.tClosenessReport(df, Seq("q"), "s", t = 0.15)
      .collect().map(r => r.getAs[Long]("emd_q") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
          r.getAs[Boolean]("at_risk")))).toMap
    assert(hist == Map(0L -> ((1L, 8L, false)),
      187500L -> ((2L, 8L, true))))
    val risky = QualityChecks
      .tClosenessRiskRows(df, Seq("q"), "s", 0.15, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(risky == (1L to 8L).map(_ -> 187500L).toMap)
    // classes (a) and (b) sail through l-diversity at l=2 — only the
    // distance to the corpus baseline flags them
    assert(QualityChecks.lDiversityRiskRows(df, Seq("q"), "s", 2, "id")
      .collect().isEmpty)
    // degenerate single-valued sensitive attribute refuses loudly
    intercept[IllegalArgumentException] {
      QualityChecks.tClosenessByClass(
        df.withColumn("s", org.apache.spark.sql.functions.lit(7)),
        Seq("q"), "s").collect()
    }
  }
}
