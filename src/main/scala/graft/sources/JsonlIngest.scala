package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion with a corrupt-record CONTRACT — the raw-dump
  * front door (web-crawl and vendor drops arrive as JSON lines, not
  * parquet): every input line is classified exactly once as `ok`,
  * `parse_error` (not a JSON object of the target shape), or
  * `missing_required` (valid JSON, required field null/absent), and the
  * classification is part of the output — an ingest that silently drops
  * malformed lines poisons every downstream count.
  *
  * Built on `spark.read.text` + `from_json` rather than the JSON
  * source's `_corrupt_record` column: the internal corrupt column cannot
  * be referenced from its own scan without caching (Spark's documented
  * restriction), while the text+from_json form is one map-only
  * projection, composes freely, and keeps the raw line available for
  * quarantine sinks. Scale shape: map-only over line splits — no
  * shuffle, no state; the report is one bounded aggregate.
  */
object JsonlIngest {

  /** One row per input line: the parsed struct (`rec`), the raw line,
    * and the contract `status`. `required` fields must be non-null for
    * `ok`.
    */
  /** from_json's PERMISSIVE mode yields an ALL-NULL struct for malformed
    * lines, indistinguishable from valid `{}` — so the parse schema
    * carries a corrupt-record capture column and a parse error is
    * "corrupt captured OR struct null", never inferred from field nulls
    * (a valid line whose fields are all null is missing_required, not
    * parse_error).
    */
  private val CorruptCol = "__corrupt_rec"

  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      required: Seq[String]): DataFrame = {
    val missing = required.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"required fields absent from schema: $missing")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not use the reserved column name $CorruptCol")
    val parseSchema = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType)
    val parsed = spark.read.textFile(path).toDF("raw")
      .select(col("raw"), from_json(col("raw"), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("rec"))
    val reqOk =
      if (required.isEmpty) lit(true)
      else required.map(f => col(s"rec.$f").isNotNull).reduce(_ && _)
    parsed.withColumn("status",
      when(col("rec").isNull || col(s"rec.$CorruptCol").isNotNull,
          lit("parse_error"))
        .when(!reqOk, lit("missing_required"))
        .otherwise(lit("ok")))
  }

  /** The contract's good rows, unwrapped to the target schema. */
  def goodRows(ingested: DataFrame): DataFrame =
    ingested.filter(col("status") === "ok")
      .select(col("rec.*")).drop(CorruptCol)

  /** Bounded ingest-health report: line counts per status. */
  def ingestReport(ingested: DataFrame): DataFrame =
    ingested.groupBy(col("status"))
      .agg(count(lit(1)).cast("long").as("n_lines"))
}
