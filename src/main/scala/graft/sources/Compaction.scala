package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning and execution — the OPTIMIZE-style table
  * maintenance op that completes the layout family ([[Bucketing]] for join
  * locality, [[ZOrder]] for scan locality, this for file-count health). A
  * 100 TB table accretes small files from streaming/incremental writes;
  * every reader then pays per-file open cost and the scheduler pays
  * per-split overhead, so periodic re-binning into target-size files is a
  * standing pipeline job in every production lakehouse.
  *
  * The PLAN is the deterministic contract (gate-checked): per partition,
  * files in `file_id` order fill the current bin until the next file would
  * overflow `targetBytes` — the sequential greedy layout production
  * compactors use (and the same close-on-overflow fold as
  * [[graft.operators.SeqPack.packGreedy]], whose recursive-CTE oracle
  * replay this reuses). Oversized files keep a bin of their own — never
  * split, never rewritten together.
  *
  * Scale shape: planning is pure METADATA work — one group per partition,
  * state bounded by files-per-partition (thousands, not rows), partitions
  * the parallel unit. Execution reads each bin's rows once and writes one
  * file per bin.
  */
object Compaction {

  /** Greedy sequential bin assignment per partition. Input columns:
    * `part` (string), `file_id` (long, the deterministic order), `bytes`
    * (long). Output adds `bin` (0-based, per partition).
    */
  def planCompaction(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("part").cast("string"), col("file_id").cast("long"),
        col("bytes").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (part, it) =>
        val sorted = it.toArray.sortBy(_._2)
        var bin = 0L
        var used = 0L
        sorted.iterator.map { case (_, id, b) =>
          if (used > 0L && used + b > targetBytes) { bin += 1L; used = b }
          else used += b
          (part, id, b, bin)
        }
      }
      .toDF("part", "file_id", "bytes", "bin")
  }

  /** Per-partition health report over a [[planCompaction]] relation:
    * file/bin counts, bytes, small-file count (< targetBytes/2), and the
    * files saved by executing the plan. Exact integer arithmetic.
    */
  def compactionReport(plan: DataFrame, targetBytes: Long): DataFrame =
    plan.groupBy(col("part"))
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum(col("bytes")).cast("long").as("total_bytes"),
        (max(col("bin")) + 1L).cast("long").as("n_bins"),
        sum(when(col("bytes") < lit(targetBytes / 2), 1L).otherwise(0L))
          .cast("long").as("n_small_files"))
      .withColumn("files_saved", (col("n_files") - col("n_bins")).cast("long"))

  /** Real-file listing of a parquet directory via the `_metadata` hidden
    * column: one row per file with its byte size, `file_id` assigned by
    * path order within the containing directory (= the partition).
    */
  def parquetFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("path"),
        col("_metadata.file_size").as("bytes"))
      .distinct()
      .withColumn("part", regexp_replace(col("path"), "/[^/]+$", ""))
      .withColumn("file_id",
        row_number().over(
          Window.partitionBy(col("part")).orderBy(col("path"))).cast("long"))

  /** Driver-side search for one int key per target partition such that
    * Spark's hash partitioning (`pmod(murmur3(key, seed=42), n)` — the
    * `HashPartitioning` contract for an INT key) sends key `p` to
    * partition `p`. With these keys, `repartition(n, col(key))` is an
    * EXACT bijection bin → partition with no hash collisions — the
    * DataFrame-native alternative to an RDD identity partitioner, which
    * keeps the rewrite inside whole-stage codegen + Tungsten rows
    * instead of deserializing every data row to a GenericRow. Expected
    * n·Hₙ probes of a 4-byte hash (coupon collector) — pure driver
    * arithmetic, no Spark job, microseconds for thousands of bins.
    * CompactionSpec pins the bijection empirically (one file per bin on
    * a real rewrite), so a change in Spark's partitioning arithmetic
    * fails loudly rather than silently merging bins.
    */
  private[graft] def bijectionKeys(n: Int): Array[Int] = {
    val keys = new Array[Int](n)
    val found = new Array[Boolean](n)
    var k = 0
    var remaining = n
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(k, 42)
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; keys(p) = k; remaining -= 1 }
      k += 1
    }
    keys
  }

  /** Execute a compaction: rewrite `inDir` to `outDir` with EXACTLY one
    * output file per planned bin. Each (part, bin) pair gets a dense id
    * 0..nBins-1 from the collected plan — bounded metadata, one row per
    * INPUT FILE, never per data row. Placement is one-bin-per-partition
    * either way (a hash `repartition` on a RAW bin key would co-locate
    * ~1/e of bins into doubled files that overshoot `targetBytes` while
    * leaving other partitions empty); the default routes each bin
    * through [[bijectionKeys]] — a plain `repartition(n, key)` whose
    * hash is a bijection by key construction, keeping the whole rewrite
    * in codegen (measured 1.7×/2.1× faster than the RDD detour at
    * ×10/×100 file counts, BASELINE.md round-10) — and
    * `useRddDetour = true` keeps the round-7 identity-`Partitioner`
    * plan for comparison. Returns (filesBefore, binsPlanned).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, useRddDetour: Boolean = false): (Long, Long) = {
    val listing = parquetFiles(spark, dir = inDir)
    val plan = planCompaction(listing, targetBytes)
      .join(listing.select(col("part"), col("file_id"), col("path")),
        Seq("part", "file_id"))
      .select(col("path"), col("part"), col("bin"))
    val pathBin = plan.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // dense bin ids in deterministic (part, bin) order — no hash collisions
    val bid = pathBin.map { case (_, part, bin) => (part, bin) }.distinct
      .sorted.zipWithIndex.toMap
    val nFiles = pathBin.length.toLong
    val nBins = bid.size
    if (nBins == 0) return (0L, 0L)
    import spark.implicits._
    if (useRddDetour) {
      val pathBid = pathBin.toSeq
        .map { case (p, part, bin) => (p, bid((part, bin))) }
        .toDF("path", "__bid")
      val data = spark.read.parquet(inDir)
        .withColumn("path", col("_metadata.file_path"))
        .join(broadcast(pathBid), Seq("path"))
        .drop("path")
      val bidIdx = data.schema.fieldIndex("__bid")
      val outSchema = org.apache.spark.sql.types.StructType(
        data.schema.filterNot(_.name == "__bid"))
      val identityPart = new org.apache.spark.Partitioner {
        override def numPartitions: Int = nBins
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      }
      val rdd = data.rdd
        .map(r => (r.getInt(bidIdx),
          org.apache.spark.sql.Row.fromSeq(r.toSeq.patch(bidIdx, Nil, 1))))
        .partitionBy(identityPart).values
      spark.createDataFrame(rdd, outSchema)
        .write.mode("overwrite").parquet(outDir)
    } else {
      val keys = bijectionKeys(nBins)
      val pathKey = pathBin.toSeq
        .map { case (p, part, bin) => (p, keys(bid((part, bin)))) }
        .toDF("path", "__k")
      spark.read.parquet(inDir)
        .withColumn("path", col("_metadata.file_path"))
        .join(broadcast(pathKey), Seq("path"))
        .drop("path")
        .repartition(nBins, col("__k"))
        .drop("__k")
        .write.mode("overwrite").parquet(outDir)
    }
    (nFiles, nBins.toLong)
  }
}
