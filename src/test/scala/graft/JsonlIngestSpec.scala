package graft

import graft.sources.JsonlIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec")
    java.nio.file.Files.write(dir.resolve("data.json"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.toString
  }

  test("every line classified exactly once; good rows unwrap to the schema") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "source": "a", "text": "hello world"}""",
      """{"doc_id": 2, "source": null, "text": "no source is ok"}""",
      """{"source": "a", "text": "missing id"}""",
      """{"doc_id": 3, "source": "b"}""",
      "garbage{",
      "",
      "[1, 2]"))
    val ing = JsonlIngest.readJsonl(spark, path, schema,
      required = Seq("doc_id", "text"))
    assert(ing.count() == 7)
    val rep = JsonlIngest.ingestReport(ing).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("ok" -> 2L, "missing_required" -> 2L,
      "parse_error" -> 3L))
    val good = JsonlIngest.goodRows(ing).orderBy("doc_id").collect()
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // non-required null field survives into the good rows
    assert(good(1).isNullAt(1))
  }

  test("JSON round-trip preserves text exactly, including escapes and unicode") {
    val texts = Seq(
      "plain words",
      "quote \" backslash \\ tab\tnewline-escape",
      "unicode: café 日本語 😀")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, "s", t) }
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl-rt").toString + "/d"
    docs.write.mode("overwrite").json(dir)
    val back = JsonlIngest.goodRows(JsonlIngest.readJsonl(
        spark, dir, schema, Seq("doc_id", "text")))
      .orderBy("doc_id").collect().map(_.getString(2)).toSeq
    assert(back == texts)
  }

  test("ingest is map-only: no exchange below the classification") {
    val path = writeLines(Seq("""{"doc_id": 1, "source": "a", "text": "x"}"""))
    val plan = JsonlIngest.readJsonl(spark, path, schema, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ingest must be map-only:\n$plan")
    // contract guard: required field must exist in the schema
    intercept[IllegalArgumentException] {
      JsonlIngest.readJsonl(spark, path, schema, Seq("nope"))
    }
  }
}
