package graft

import graft.streaming.StreamingDiff
import org.apache.spark.sql.functions._

class StreamingDiffSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static diff emits added and changed rows across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val refFp = StreamingDiff.referenceFingerprints(ref, Seq("id"), Seq("v"))

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val query = StreamingDiff.changes(
        stream.toDF().toDF("id", "v"), refFp, Seq("id"), Seq("v"))
      .writeStream.format("memory").queryName("diff_stream_test")
      .outputMode("append").start()
    try {
      stream.addData((1L, "a"), (2L, "B"))  // unchanged + changed
      query.processAllAvailable()
      stream.addData((4L, "d"), (3L, "c"))  // added + unchanged
      query.processAllAvailable()
      val got = spark.table("diff_stream_test")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(got == Set(2L -> "changed", 4L -> "added"),
        s"unexpected change set: $got")
    } finally query.stop()
  }

  test("batch-mode parity with TableDiff on real data (minus removed)") {
    val docs = Tables.documents(spark, sf001)
    val v1 = docs.filter($"doc_id" % 7 =!= 0)
    val v2 = docs.filter($"doc_id" % 5 =!= 0)
      .withColumn("text", when($"doc_id" % 11 === 0,
        concat($"text", lit(" v2"))).otherwise($"text"))
    val refFp = StreamingDiff.referenceFingerprints(v1, Seq("doc_id"),
      Seq("text"))
    val streamed = StreamingDiff.changes(v2, refFp, Seq("doc_id"), Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    val batch = graft.operators.TableDiff
      .diff(v1, v2, Seq("doc_id"), Seq("text"))
      .filter($"status".isin("added", "changed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(streamed == batch,
      s"stream twin diverged from batch diff: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
  }
}
