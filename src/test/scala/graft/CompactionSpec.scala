package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def listing(rows: (String, Long, Long)*) =
    rows.toDF("part", "file_id", "bytes")

  test("greedy plan respects capacity except oversized singletons") {
    val files = listing(
      ("p", 1L, 300L), ("p", 2L, 300L), ("p", 3L, 300L), // bin 0: 900
      ("p", 4L, 200L), ("p", 5L, 900L),                  // bin 1: 200 -> 5 overflows
      ("p", 6L, 5000L),                                  // oversized: own bin
      ("p", 7L, 100L))
    val plan = Compaction.planCompaction(files, targetBytes = 1000L)
      .orderBy("file_id").collect()
    assert(plan.map(_.getLong(3)).toSeq == Seq(0L, 0L, 0L, 1L, 2L, 3L, 4L))
    // capacity invariant: every multi-file bin fits the target
    val byBin = plan.groupBy(_.getLong(3)).view
      .mapValues(rs => (rs.length, rs.map(_.getLong(2)).sum))
    byBin.foreach { case (bin, (n, tot)) =>
      assert(n == 1 || tot <= 1000L, s"bin $bin holds $tot bytes over target")
    }
  }

  test("partitions plan independently and no file is lost or duplicated") {
    val files = (1L to 50L).flatMap(i =>
      Seq(("a", i, 400L), ("b", i, 700L))).toDF("part", "file_id", "bytes")
    val plan = Compaction.planCompaction(files, 1000L)
    assert(plan.count() == 100)
    assert(plan.select("part", "file_id").distinct().count() == 100)
    // a: 2 files per bin (400+400, third overflows) => 25 bins; b: 1 per bin
    val bins = plan.groupBy("part").agg(countDistinct("bin").as("nb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bins("a") == 25L && bins("b") == 50L)
  }

  test("plan is deterministic under adversarial input partitioning") {
    val base = (1L to 97L).map(i => ("p" + (i % 7), i, 50L + (i * 37) % 900))
    val a = Compaction.planCompaction(base.toDF("part", "file_id", "bytes"), 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val b = Compaction.planCompaction(
        base.reverse.toDF("part", "file_id", "bytes").repartition(13), 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(a == b)
  }

  test("report: files_saved = n_files - n_bins, small files counted") {
    val files = listing(("p", 1L, 100L), ("p", 2L, 100L), ("p", 3L, 800L))
    val rep = Compaction.compactionReport(
      Compaction.planCompaction(files, 1000L), 1000L).collect()(0)
    assert(rep.getAs[Long]("n_files") == 3L)
    assert(rep.getAs[Long]("n_bins") == 1L)
    assert(rep.getAs[Long]("files_saved") == 2L)
    assert(rep.getAs[Long]("n_small_files") == 2L) // < 500
  }

  test("end-to-end: a fragmented parquet dir compacts to fewer files, rows intact") {
    val in = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    Tables.lineitem(spark, sf001).limit(2000)
      .repartition(40) // fragment: 40 small files
      .write.mode("overwrite").parquet(in)
    val rowsBefore = spark.read.parquet(in).count()
    val filesBefore = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 30, s"fixture not fragmented: $filesBefore files")
    val (nFiles, nBins) = Compaction.compactParquet(spark, in, out,
      targetBytes = 512L * 1024L)
    assert(nFiles == filesBefore.toLong)
    assert(nBins < nFiles / 2, s"plan saved too little: $nFiles -> $nBins")
    assert(spark.read.parquet(out).count() == rowsBefore)
    val filesAfter = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // the plan's promise is EXACT: one output file per planned bin, so the
    // size ceiling the plan computed actually holds in the rewrite —
    // this also pins the bijectionKeys construction empirically (a drift
    // in Spark's hash-partitioning arithmetic would merge bins here)
    assert(filesAfter == nBins.toInt,
      s"wrote $filesAfter files for $nBins planned bins")
    // the RDD-detour path must produce the same bin layout and rows
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-compact-out2").toString
    val (_, nBins2) = Compaction.compactParquet(spark, in, out2,
      targetBytes = 512L * 1024L, useRddDetour = true)
    assert(nBins2 == nBins)
    assert(new java.io.File(out2).listFiles()
      .count(_.getName.endsWith(".parquet")) == nBins.toInt)
    val a = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(out2).collect().map(_.toString).sorted.toSeq
    assert(a == b, "native and RDD rewrites diverged in content")
  }

  test("bijectionKeys: one key per partition, keys distinct") {
    for (n <- Seq(1, 2, 7, 64, 1000)) {
      val keys = Compaction.bijectionKeys(n)
      assert(keys.distinct.length == n)
      keys.zipWithIndex.foreach { case (k, p) =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(k, 42)
        assert(((h % n) + n) % n == p, s"key $k does not land in $p")
      }
    }
  }
}
