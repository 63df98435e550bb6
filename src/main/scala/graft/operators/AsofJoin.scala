package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 engine-added): for every left row, the latest
  * right row with right.ts <= left.ts per key — the event-time lookup
  * (latest price/state before an event) that normally tempts people into
  * per-key collects.
  *
  * Implementation is the union-scan idiom: tag both sides, union, one window
  * per key ordered by (ts, tag) carrying `last(right_payload, ignoreNulls)`
  * forward, keep left rows. Exactly ONE shuffle (the window partition) and
  * one sort — same cost as a sort-merge join, no range explosion, no
  * per-key state. Right rows at ts equal to a left row match (inclusive),
  * because right sorts before left on the tie-break tag.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPrefix: String = "asof_"): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c))
    val rightPayload = right.columns.filterNot(c => keys.contains(c))

    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__tag"),
        struct(leftPayload.map(col): _*).as("__lv"),
        lit(null).cast(right.select(rightPayload.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (s, f) => s.add(f))).as("__rv")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__tag"),
        lit(null).cast(left.select(leftPayload.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (s, f) => s.add(f))).as("__lv"),
        struct(rightPayload.map(col): _*).as("__rv")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val leftCols = keys.map(col) ++ leftPayload.map(c => col(s"__lv.$c").as(c))
    val rightCols = rightPayload.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    matched.select(leftCols ++ rightCols: _*)
  }
}
