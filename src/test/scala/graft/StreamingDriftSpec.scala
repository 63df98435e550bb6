package graft

import graft.operators.QuantileSketch
import graft.streaming.StreamingDrift
import org.apache.spark.sql.functions._

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def refValues: Seq[Double] =
    Tables.documents(spark, sf001).filter($"doc_id" % 2 === 0)
      .select($"n_chars".cast("double")).as[Double].collect().toSeq

  test("exact-regime sketch boundaries equal the exact reference deciles") {
    val xs = refValues
    assume(xs.length <= 256)
    val art = xs.toDF("x").agg(QuantileSketch.sketch($"x").as("sk"))
      .collect()(0)
      .getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
      .map(_.toSeq).toSeq
    val bounds = StreamingDrift.boundariesFromSketch(art, 10)
    val sorted = xs.sorted
    (1 until 10).foreach { i =>
      val target = math.max(1L, math.ceil(i / 10.0 * xs.length).toLong).toInt
      assert(bounds(i - 1) == sorted(target - 1), s"boundary $i diverged")
    }
  }

  test("streamed PSI matches the driver-computed score after micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val xs = refValues
    val art = xs.toDF("x").agg(QuantileSketch.sketch($"x").as("sk"))
      .collect()(0)
      .getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
      .map(_.toSeq).toSeq
    val bounds = StreamingDrift.boundariesFromSketch(art, 10)
    val refCounts = {
      val a = new Array[Long](10)
      xs.foreach(v => a(StreamingDrift.bucketOf(v, bounds)) += 1L)
      a
    }
    val streamRows = Tables.documents(spark, sf001)
      .filter($"doc_id" % 2 === 1)
      .select($"source", $"n_chars".cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val query = StreamingDrift.psiAgainstReference(
        stream.toDF().toDF("source", "n_chars"),
        bounds, refCounts)
      .writeStream.format("memory").queryName("psi_stream_test")
      .outputMode("append").start()
    try {
      val (b1, rest) = streamRows.splitAt(streamRows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => stream.addData(b); query.processAllAvailable() }
      val finals = spark.table("psi_stream_test")
        .withColumn("seq", monotonically_increasing_id())
        .orderBy($"seq".desc).collect()
        .groupBy(_.getString(0)).map { case (s, rows) => s -> rows.head }
      // driver reference: fold ALL stream rows per source
      val bySource = streamRows.groupBy(_._1)
      bySource.foreach { case (src, rows) =>
        val counts = new Array[Long](10)
        rows.foreach(r => counts(StreamingDrift.bucketOf(r._2, bounds)) += 1L)
        val want = StreamingDrift.psiOf(counts, refCounts)
        val got = finals(src)
        assert(got.getLong(1) == rows.length, s"$src row count")
        assert(got.getDouble(3) == want, s"$src psi: ${got.getDouble(3)} vs $want")
        assert(got.getAs[scala.collection.Seq[Long]](2).length == 10,
          s"$src state not bounded at 10 buckets")
      }
    } finally query.stop()
  }

  test("identical distributions score near zero, shifted ones score high") {
    val bounds = Array(10.0, 20.0, 30.0)
    val ref = Array(100L, 100L, 100L, 100L)
    assert(math.abs(StreamingDrift.psiOf(Array(50L, 50L, 50L, 50L), ref)) < 1e-3)
    val shifted = StreamingDrift.psiOf(Array(200L, 0L, 0L, 0L), ref)
    assert(shifted > 1.0, s"shifted distribution scored only $shifted")
  }
}
