package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling evidence for SURVEY.md §4.4 (round-5 verdict item 3):
  * derive a 10× corpus from sf0.1, run the six heaviest pipeline families
  * at both sizes, and report wall time + the fitted scaling exponent
  * alpha = log10(t10x / t1x) — alpha ≈ 1 is linear scaling, alpha > 1
  * reveals a superlinear stage that would bite at 100 TB.
  *
  * The 10× derivation is built so every family's WORK scales linearly
  * like a naturally larger corpus would, instead of exploding:
  *
  *  - documents: 10 id-shifted copies; copy i > 0 suffixes EVERY word
  *    with "_i". A bijective word substitution preserves all within-copy
  *    equality structure exactly (exact dups, shingle overlaps, word
  *    frequencies per copy) while sharing NO shingle across copies — so
  *    dup clusters, gram tables, and candidate pairs grow 10×, not 100×
  *    (naive replication makes every doc a 10-member near-dup cluster
  *    and quadratically inflates the pair graph — measured and rejected).
  *  - embeddings: 10 id-shifted copies; copy i rotates the vector by i
  *    dimensions — norms and per-dim distributions identical, cross-copy
  *    cosines arbitrary (no synthetic near-dup inflation).
  *  - customer: 10 key-shifted copies; copy i > 0 prefixes names with a
  *    3-digit run ("111_", …) so cross-copy edit distance ≥ 3 > tau and
  *    within-copy typo structure is untouched.
  *
  * Usage: runMain graft.tools.ScaleBench [baseSfDir] [outRoot]
  * Emits one JSON line per family: {"family":…,"t_1x":…,"t_10x":…,
  * "alpha":…} (min of 2 runs each), then a summary line.
  */
object ScaleBench {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  private def buildScaled(spark: SparkSession, base: String, out: String): Unit = {
    if (new java.io.File(s"$out/_SUCCESS_SCALE").exists()) return
    val copies = 0 until 10
    val shift = 10000000L

    val docs = spark.read.parquet(s"$base/documents.parquet")
    copies.map { i =>
      val t =
        if (i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$i"))), " ")
      docs.withColumn("doc_id", col("doc_id") + lit(i * shift))
        .withColumn("text", t)
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    copies.map { i =>
      val v =
        if (i == 0) col("embedding")
        else concat(slice(col("embedding"), i + 1, 10000),
          slice(col("embedding"), 1, i))
      emb.withColumn("vec_id", col("vec_id") + lit(i * shift))
        .withColumn("embedding", v)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val cust = spark.read.parquet(s"$base/customer.parquet")
    copies.map { i =>
      val n =
        if (i == 0) col("c_name")
        else concat(lit(i.toString * 3 + "_"), col("c_name"))
      cust.withColumn("c_custkey", col("c_custkey") + lit(i * shift))
        .withColumn("c_name", n)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    new java.io.File(s"$out/_SUCCESS_SCALE").createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = args.lift(1).getOrElse("target/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-scale-warehouse").toString)
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val x10 = s"$outRoot/x10"
    buildScaled(spark, base, x10)

    // family -> the action to time against a corpus dir. Gate-query
    // families run through SparkEntry so the timed plan is exactly the
    // graded one; ed-join calls the operator over the FULL name table
    // (the gate's oracle-replayability bound would cap the 10x work).
    val families: Seq[(String, (SparkSession, String) => Long)] = Seq(
      "dedup_canonicalize" -> ((s: SparkSession, dir: String) =>
        graft.SparkEntry.queries("tx_dedup_canonical")(s, dir).count()),
      "setjoin_jaccard" -> ((s: SparkSession, dir: String) =>
        graft.SparkEntry.queries("t_setjoin_jaccard_pairs")(s, dir).count()),
      "edjoin_full_names" -> ((s: SparkSession, dir: String) => {
        val c = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey"), col("c_name"))
        graft.operators.EdJoin.edJoin(c, tau = 1,
          idCol = "c_custkey", strCol = "c_name").count()
      }),
      "cross_source_overlap" -> ((s: SparkSession, dir: String) =>
        graft.SparkEntry.queries("t_cross_source_overlap")(s, dir).count()),
      "source_mixture" -> ((s: SparkSession, dir: String) =>
        graft.SparkEntry.queries("t_source_mixture_sample")(s, dir).count()),
      "curation_funnel" -> ((s: SparkSession, dir: String) =>
        graft.SparkEntry.queries("tx_curation_funnel")(s, dir).count()))

    def time(fn: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val rows = families.map { case (name, fn) =>
      // min of 2 at each size (same one-sided-noise argument as Bench)
      val a = Seq.fill(2)(time(fn(spark, base)))
      val b = Seq.fill(2)(time(fn(spark, x10)))
      val t1 = a.map(_._1).min
      val t10 = b.map(_._1).min
      val alpha = math.log(t10 / t1) / math.log(10.0)
      println(s"""{"family":"$name","t_1x":${fmt(t1)},"t_10x":${fmt(t10)},""" +
        s""""alpha":${fmt(alpha)},"rows_1x":${a.head._2},"rows_10x":${b.head._2}}""")
      (name, t1, t10, alpha)
    }
    val worst = rows.maxBy(_._4)
    println(s"""{"metric":"scale_exponents","n_families":${rows.size},""" +
      s""""worst_family":"${worst._1}","worst_alpha":${fmt(worst._4)}}""")
    spark.stop()
  }
}
