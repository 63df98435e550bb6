package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the data-versioning primitive ("what changed
  * between yesterday's corpus and today's"): a single full-outer join on
  * the key classifies every row as `added` (key only in the new
  * snapshot), `removed` (only in the old), `changed` (both sides, value
  * fingerprint differs) or `unchanged`. The fingerprint is md5 over the
  * compared columns (null-tagged concat, so NULL vs empty-string cannot
  * collide), computed map-side on each snapshot — the join ships one
  * 32-char hash per row, never the payload.
  *
  * 100 TB shape: one shuffle per side on the key (or zero with
  * co-bucketed snapshots — [[graft.sources.Bucketing]]), fingerprints
  * instead of payloads through the exchange, and the summary is a
  * 4-row aggregate. The reference re-extracts everything when inputs
  * change (/root/reference/src/extract_embedding.py full-directory
  * rescan); this is the incremental contract that replaces that rescan.
  */
object TableDiff {

  /** Row-level diff: (key..., status). `compareCols` default = all
    * non-key columns shared by both sides.
    */
  def diff(old: DataFrame, neu: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Seq.empty): DataFrame = {
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else old.columns.filterNot(keyCols.contains).toSeq
        .intersect(neu.columns.toSeq)
    require(cmp.nonEmpty, "no columns to compare")
    // null-tagged and per-column-hashed: each column hashes to fixed-width
    // hex BEFORE the join, so a value containing the separator can never
    // shift across column boundaries ('x|0y','z') vs ('x','y|0z'), and a
    // NULL column and an empty string produce different fingerprints
    def fp(df: DataFrame) = md5(concat_ws("|",
      cmp.map(c => md5(concat(isnull(col(c)).cast("int"),
        coalesce(col(c).cast("string"), lit(""))))): _*))
    val a = old.select(keyCols.map(col) :+ fp(old).as("__fa"): _*)
    val b = neu.select(keyCols.map(col) :+ fp(neu).as("__fb"): _*)
    a.join(b, keyCols, "full_outer")
      .withColumn("status",
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") =!= col("__fb"), "changed")
          .otherwise("unchanged"))
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** The 4-row publishable summary of a diff. */
  def summary(old: DataFrame, neu: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Seq.empty): DataFrame =
    diff(old, neu, keyCols, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
}
