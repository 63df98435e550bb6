package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins (SURVEY.md §4.3,
  * the 100 TB join strategy): write both fact tables bucketed+sorted on the
  * join key once, and every subsequent equi-join on that key is a zero-
  * exchange sort-merge — the shuffle is paid at write time, amortized over
  * all downstream joins.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. The pre-write
    * `repartition(numBuckets, key)` uses the SAME Murmur3 hash partitioning
    * as the bucket spec, so every task holds exactly one bucket's rows and
    * writes one file — without it each of the N input tasks writes a
    * fragment per bucket (N·numBuckets small files, and at 1000 executors a
    * small-file explosion that throttles the namenode and the downstream
    * scan).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(numBuckets, col(key))
      .write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketing tables on their bucket key — plans with no
    * Exchange when bucket specs line up.
    */
  def coLocatedJoin(spark: SparkSession, tableA: String, tableB: String,
      key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
