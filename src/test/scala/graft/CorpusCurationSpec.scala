package graft

import graft.pipelines.CorpusCuration
import org.apache.spark.sql.functions._

class CorpusCurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val curated = CorpusCuration.run(
    docs.filter(col("doc_id") % 50 =!= 0),
    docs.filter(col("doc_id") % 50 === 0))

  test("funnel is monotone non-increasing and every stage fires") {
    val f = curated.funnel.orderBy(col("stage")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val counts = f.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${f.toSeq}")
    assert(counts.head > counts.last, "pipeline dropped nothing — vacuous")
    assert(counts.last > 0, "pipeline dropped everything")
  }

  test("packed output covers exactly the surviving docs within capacity") {
    val packed = curated.packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val survivors = curated.funnel.filter(col("stage") === "5_decontaminated")
      .head().getLong(1)
    assert(packed.length.toLong == survivors, "packed docs != survivors")
    packed.groupBy(_._3).foreach { case (bin, rows) =>
      assert(rows.map(_._2).sum <= 512 || rows.length == 1, s"bin $bin overflow")
    }
  }

  test("sf0.1 funnel: monotone, every stage in its expected drop band") {
    // pipeline-LEVEL regression net at the bench scale factor: operator
    // specs can all stay green while a composition bug (wrong stage order,
    // filter inverted, join dropping survivors) shifts the funnel shape.
    val docs1 = Tables.documents(spark, sf1)
    val f = CorpusCuration.run(
        docs1.filter(col("doc_id") % 50 =!= 0),
        docs1.filter(col("doc_id") % 50 === 0))
      .funnel.orderBy(col("stage")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    info(s"sf0.1 funnel: ${f.toSeq}")
    val byStage = f.toMap
    val n0 = byStage("0_input").toDouble
    val counts = f.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${f.toSeq}")
    // stage ratio bands (vs input) for the synthetic corpus: quality rules
    // drop a minority; redaction drops nothing; each dedup/decontamination
    // stage trims but never guts the corpus
    assert(byStage("1_rules") / n0 >= 0.5 && byStage("1_rules") / n0 <= 0.99,
      s"rules kept ${byStage("1_rules") / n0}")
    assert(byStage("2_redacted") == byStage("1_rules"), "redaction dropped rows")
    assert(byStage("3_exact_dedup") / n0 >= 0.4, s"exact dedup kept ${byStage("3_exact_dedup") / n0}")
    assert(byStage("4_near_dedup") / n0 >= 0.35, s"near dedup kept ${byStage("4_near_dedup") / n0}")
    assert(byStage("5_decontaminated") / n0 >= 0.3,
      s"decontamination kept ${byStage("5_decontaminated") / n0}")
    // the pipeline must actually be doing work at this scale too
    assert(byStage("5_decontaminated") < byStage("0_input"))
  }

  test("no PII shapes survive and no exact duplicates survive") {
    // re-join packed ids to the redacted text through a fresh run of the
    // stages (cheap at this SF) — emails/IPs/long digit runs must be gone
    val textById = graft.operators.Dedup.exact(
        docs.filter(col("doc_id") % 50 =!= 0)
          .withColumn("text", graft.functions.TextOps.redactPii(col("text"))))
      .select(col("doc_id"), col("text"))
    val bad = textById.filter(
      col("text").rlike(graft.functions.TextOps.emailPattern) ||
      col("text").rlike(graft.functions.TextOps.ipv4Pattern) ||
      col("text").rlike(graft.functions.TextOps.digitRunPattern))
    assert(bad.count() == 0, "PII shapes survived redaction")
    val dupTexts = textById.groupBy(col("text")).count().filter(col("count") > 1)
    assert(dupTexts.count() == 0, "exact duplicates survived")
  }
}
