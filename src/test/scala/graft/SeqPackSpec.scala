package graft

import graft.functions.TextOps
import graft.operators.SeqPack
import org.apache.spark.sql.functions._

class SeqPackSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)
    .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
    .cache()

  test("greedy packing: capacity respected, no document lost or duplicated") {
    val max = 512
    val packed = SeqPack.packGreedy(docs, "n_tokens", max).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val inputIds = docs.collect().map(_.getLong(0)).sorted
    assert(packed.map(_._1).sorted.toSeq == inputIds.toSeq, "docs lost/duplicated")
    packed.groupBy(_._3).foreach { case (bin, rows) =>
      val total = rows.map(_._2).sum
      assert(total <= max || rows.length == 1,
        s"bin $bin overflows with ${rows.length} docs, $total tokens")
    }
    // documents in a bin share a shard (bins never cross shards); default
    // shard count derives from spark.sql.shuffle.partitions
    val shards = spark.conf.get("spark.sql.shuffle.partitions").toInt
    packed.groupBy(_._3).foreach { case (bin, rows) =>
      assert(rows.map(r => r._1 % shards).distinct.length == 1,
        s"bin $bin spans shards")
      assert(bin >> 33 == rows.head._1 % shards, s"bin $bin id not shard-prefixed")
    }
  }

  test("greedy packing is deterministic across runs") {
    val a = SeqPack.packGreedy(docs, "n_tokens", 512).collect().toSeq.sortBy(_.getLong(0))
    val b = SeqPack.packGreedy(docs, "n_tokens", 512).collect().toSeq.sortBy(_.getLong(0))
    assert(a == b)
  }

  test("greedy bins are dense within a shard and fill at least half capacity") {
    // first-fit over ordered docs: every bin except a shard's last must be
    // > max - next_doc_tokens full; with this corpus's ~30-100-token docs a
    // ≥ 50% mean fill is the sanity floor for "actually packing"
    val packed = SeqPack.packGreedy(docs, "n_tokens", 512).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val fills = packed.groupBy(_._2).map { case (_, rs) => rs.map(_._1).sum }
    val meanFill = fills.sum.toDouble / fills.size / 512.0
    assert(meanFill >= 0.5, s"mean bin fill $meanFill — not packing")
  }

  test("chunked packing: offsets are contiguous per shard, bins are offset chunks") {
    val max = 512
    val packed = SeqPack.packChunked(docs, "n_tokens", max).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    packed.groupBy(_._3).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._1)
      var expect = 0L
      ordered.foreach { case (id, tok, _, off, bin) =>
        assert(off == expect, s"doc $id offset $off, expected $expect")
        assert(bin == shard * (1L << 33) + off / max, s"doc $id bin mismatch")
        expect += tok
      }
    }
  }
}
