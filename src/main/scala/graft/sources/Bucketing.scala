package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins (SURVEY.md §4.3,
  * the 100 TB join strategy): write both fact tables bucketed+sorted on the
  * join key once, and every subsequent equi-join on that key is a zero-
  * exchange sort-merge — the shuffle is paid at write time, amortized over
  * all downstream joins.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key — plans with no
    * Exchange when bucket specs line up.
    */
  def coLocatedJoin(spark: SparkSession, tableA: String, tableB: String,
      key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
