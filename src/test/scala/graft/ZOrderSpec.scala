package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave for verification. */
  private def morton(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var r = v & 0xFFFFL
      r = (r | (r << 8)) & 0x00FF00FF00FF00FFL
      r = (r | (r << 4)) & 0x0F0F0F0F0F0F0F0FL
      r = (r | (r << 2)) & 0x3333333333333333L
      r = (r | (r << 1)) & 0x5555555555555555L
      r
    }
    spread(x) | (spread(y) << 1)
  }

  test("interleave matches the reference Morton code on the full 16-bit lattice edge") {
    val df = ((0 until 512) ++ Seq(65535, 32768, 21845)).flatMap(x =>
      Seq((x.toLong, ((x * 2654435761L) & 0xFFFFL))))
      .toDF("x", "y")
    val z = df.withColumn("z", ZOrder.interleave(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    z.foreach { case (x, y, zv) =>
      assert(zv == morton(x, y), s"z($x,$y)=$zv != ${morton(x, y)}")
    }
  }

  test("zValue rank buckets are monotone in each key") {
    val df = (0 until 500).map(i => (i.toDouble, (499 - i).toDouble)).toDF("x", "y")
    val z = df.withColumn("z", ZOrder.zValue(df, col("x"), col("y")))
    // x's even-position bits must be non-decreasing with x: extract them
    // by masking and compare the bucket (de-interleaved via driver check)
    val rows = z.collect().map(r => (r.getDouble(0), r.getLong(2)))
    def unspread(v: Long): Long = {
      var r = v & 0x5555555555555555L
      r = (r | (r >> 1)) & 0x3333333333333333L
      r = (r | (r >> 2)) & 0x0F0F0F0F0F0F0F0FL
      r = (r | (r >> 4)) & 0x00FF00FF00FF00FFL
      r = (r | (r >> 8)) & 0xFFFFL
      r
    }
    val byX = rows.sortBy(_._1).map(t => unspread(t._2))
    assert(byX.zip(byX.tail).forall { case (a, b) => a <= b },
      "x rank bucket not monotone")
  }

  test("z-layout gives multi-key locality a single-key sort cannot") {
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey"))
    val files = 16
    def partkeyOverlaps(df: org.apache.spark.sql.DataFrame): Int = {
      // per-partition (file analog) partkey min/max, then count partitions
      // a narrow partkey range predicate would have to read
      val spans = df.select(col("l_partkey"))
        .mapPartitions { it =>
          val vs = it.map(_.getLong(0)).toSeq
          if (vs.isEmpty) Iterator.empty
          else Iterator((vs.min, vs.max))
        }.collect()
      val (lo, hi) = (spans.map(_._1).min, spans.map(_._2).max)
      val w = (hi - lo) / 50 // a 2% partkey range query
      val q0 = lo + (hi - lo) / 3
      spans.count { case (mn, mx) => mx >= q0 && mn <= q0 + w }
    }
    val zLayout = ZOrder.layout(li, col("l_orderkey"), col("l_partkey"), files)
    val singleKey = li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    val (zHit, sHit) = (partkeyOverlaps(zLayout), partkeyOverlaps(singleKey))
    // orderkey-sorted files each cover ~the full partkey range → a partkey
    // predicate reads everything; the curve layout must prune materially
    assert(sHit >= files * 3 / 4, s"baseline unexpectedly prunes ($sHit/$files)")
    assert(zHit * 2 <= sHit, s"z-order hit $zHit vs single-key $sHit of $files")
  }

  test("frozen-layout append assigns rows exactly as the artifact dictates") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_partkey")
    val base = li.filter($"l_orderkey" % 3 =!= 0)
    val fresh = li.filter($"l_orderkey" % 3 === 0)
    val meta = graft.sources.ZOrder.layoutMeta(base,
      $"l_orderkey", $"l_partkey", numFiles = 8)
    // the frozen contract: assignment is a pure function of (meta, row) —
    // appending the fresh batch and re-assigning base+fresh together must
    // give every fresh row the same file id
    val viaAppend = fresh
      .withColumn("fid", graft.sources.ZOrder.fileIdUnder(meta,
        $"l_orderkey", $"l_partkey"))
      .select($"l_orderkey", $"l_partkey", $"fid")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaUnion = base.unionByName(fresh)
      .withColumn("fid", graft.sources.ZOrder.fileIdUnder(meta,
        $"l_orderkey", $"l_partkey"))
      .filter($"l_orderkey" % 3 === 0)
      .select($"l_orderkey", $"l_partkey", $"fid")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaAppend == viaUnion, "assignment depended on the batch, not the artifact")
    // appended files keep narrow spans on BOTH keys: each appended file id
    // must overlap the z-span structure, so per-file key ranges stay far
    // narrower than the global range
    val spans = graft.sources.ZOrder.appendToLayout(fresh, meta,
        $"l_orderkey", $"l_partkey")
      .groupBy($"__fid")
      .agg(min($"l_orderkey").as("okmin"), max($"l_orderkey").as("okmax"),
        min($"l_partkey").as("pkmin"), max($"l_partkey").as("pkmax"))
      .collect()
    val (okLo, okHi) = (fresh.agg(min($"l_orderkey")).head.getLong(0),
      fresh.agg(max($"l_orderkey")).head.getLong(0))
    val avgSpan = spans.map(r => r.getLong(2) - r.getLong(1)).sum.toDouble / spans.length
    assert(spans.length >= 4, s"append collapsed to ${spans.length} files")
    assert(avgSpan < (okHi - okLo) * 0.8,
      s"appended files carry no orderkey locality: avg $avgSpan of ${okHi - okLo}")
  }

  test("layout metadata round-trips through parquet") {
    val li = Tables.lineitem(spark, sf001).select($"l_orderkey", $"l_partkey")
    val meta = graft.sources.ZOrder.layoutMeta(li,
      $"l_orderkey", $"l_partkey", numFiles = 8)
    val dir = java.nio.file.Files.createTempDirectory("zmeta").toString
    graft.sources.ZOrder.saveLayoutMeta(spark, meta, dir)
    val back = graft.sources.ZOrder.loadLayoutMeta(spark, dir)
    assert(back.boundsA.toSeq == meta.boundsA.toSeq &&
      back.boundsB.toSeq == meta.boundsB.toSeq &&
      back.fileBounds.toSeq == meta.fileBounds.toSeq,
      "layout artifact changed across persistence")
  }
}
