package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the SPARSE retrieval serving artifact beside
  * [[SimilaritySearch]]'s dense IVF family: build once from a corpus
  * (term-bucketed posting lists + document lengths + term document
  * frequencies + corpus stats), persist as partitioned parquet, probe many
  * times with BM25 scoring. The probe reads ONLY the query terms' hash
  * buckets (parquet partition pruning on the bucket column), so serving
  * cost scales with query-term posting sizes, never corpus size — the
  * build-once/probe-many contract `saveIvfIndex` established, applied to
  * lexical search.
  *
  * BM25 scoring (Robertson & Zaragoza 2009; k1 = 1.2, b = 0.75) uses the
  * IDENTICAL float operation order as the `t_bm25_topk` gate, so a probe
  * against the artifact is bit-equal to the direct corpus computation —
  * which is exactly what makes the artifact trustworthy: persisting the
  * index must not change a single score.
  */
object InvertedIndex {

  /** Number of hash buckets the posting lists partition into; the probe
    * prunes to the query terms' buckets. */
  val Buckets = 64

  final case class LexIndex(
      postings: DataFrame, // term, doc_id, tf, bucket
      docLens: DataFrame,  // doc_id, dl
      termDf: DataFrame,   // term, df
      n: Long,
      sdl: Long) {
    /** Mean document length, derived from the exact integer sums so an
      * appended artifact reproduces it bit-for-bit. */
    def avgdl: Double = if (n == 0) 0.0 else sdl.toDouble / n.toDouble
  }

  private def bucketOf(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(Buckets.toLong)).cast("int")

  /** One corpus pass: whitespace terms → (doc, term) counts; doc lengths
    * and term dfs are bounded rollups of the posting relation.
    */
  def build(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): LexIndex = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val postings = tf.withColumn("bucket", bucketOf(col("term")))
    val docLens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val termDf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // two bounded scalars close the build — the artifact's meta row
    val nRow = docs.agg(count(lit(1)).as("n")).collect()(0)
    val n = nRow.getLong(0)
    val sdl =
      if (n == 0) 0L else docLens.agg(sum(col("dl"))).collect()(0).getLong(0)
    LexIndex(postings, docLens, termDf, n, sdl)
  }

  /** Persist: postings partitioned by term hash bucket (the pruning key),
    * doc lengths and term dfs as plain parquet, stats as a one-row meta
    * table.
    */
  def save(idx: LexIndex, dir: String): Unit = {
    idx.postings.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    idx.docLens.write.mode("overwrite").parquet(s"$dir/doclens")
    idx.termDf.write.mode("overwrite").parquet(s"$dir/termdf")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    Seq((idx.n, idx.sdl)).toDF("n", "sdl")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Append a disjoint batch of new documents to a persisted index: the
    * delta's postings/doc-lengths/dfs/meta write as APPEND rows and
    * [[load]] re-aggregates (df and the (n, sdl) stats are sums, exact
    * because doc ids are disjoint across batches — the caller's contract,
    * as in `appendToIvfIndex`). A probe after append is bit-identical to
    * a rebuild over the unioned corpus (spec-pinned): every BM25 input —
    * df, n, avgdl, tf, dl — is an exact integer or a ratio of exact sums.
    */
  def append(dir: String, newDocs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val delta = build(newDocs, idCol, textCol)
    val spark = newDocs.sparkSession
    import spark.implicits._
    delta.postings.write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/postings")
    delta.docLens.write.mode("append").parquet(s"$dir/doclens")
    delta.termDf.write.mode("append").parquet(s"$dir/termdf")
    Seq((delta.n, delta.sdl)).toDF("n", "sdl")
      .write.mode("append").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): LexIndex = {
    // meta and termDf re-aggregate so appended deltas merge exactly
    val meta = spark.read.parquet(s"$dir/meta")
      .agg(sum(col("n")), sum(col("sdl"))).collect()(0)
    LexIndex(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclens"),
      spark.read.parquet(s"$dir/termdf")
        .groupBy(col("term")).agg(sum(col("df")).as("df")),
      meta.getLong(0), meta.getLong(1))
  }

  /** BM25 top-k over the artifact for a bag of query terms. The posting
    * scan filters on the terms' buckets FIRST (partition pruning), then on
    * the terms; scores sum per doc through the exact-decimal boundary and
    * rank by (score desc, doc_id) — the [[graft.queries]] Exact convention,
    * so direct and artifact probes agree bit-for-bit.
    */
  def bm25TopK(idx: LexIndex, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    // bucket choice replays the build-side bucketing expression exactly
    val qdf = terms.toDF("term").withColumn("bucket", bucketOf(col("term")))
    val buckets = qdf.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val q = qdf.drop("bucket")
      .join(idx.termDf, Seq("term")) // df per query term
    val sc = idx.postings
      .filter(col("bucket").isin(buckets: _*))
      .join(broadcast(q), Seq("term"))
      .join(idx.docLens, Seq("doc_id"))
      .withColumn("s",
        log(((lit(idx.n) - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)) + lit(1.0)) *
        ((col("tf").cast("double") * lit(k1 + 1.0)) /
         (col("tf").cast("double") + lit(k1) *
           (lit(1.0 - b) + lit(b) *
             (col("dl").cast("double") / lit(idx.avgdl))))))
    sc.groupBy(col("doc_id"))
      .agg(floor(sum(col("s").cast(
          org.apache.spark.sql.types.DecimalType(27, 12)))
        .cast("double") * lit(1000000.0)).cast("long").as("score_q"))
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(k)
  }

}
