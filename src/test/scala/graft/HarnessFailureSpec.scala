package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-12 loud-failure contract: a throwing gate must be as visible in
  * the driver artifacts as a failed build (VERDICT r11 item 2 — a broken
  * gate vanished from CORRECTNESS and its time-to-exception was billed as
  * a successful bench entry).
  */
class HarnessFailureSpec extends SparkSpec {

  private def boom: DataFrame =
    throw new IllegalStateException("deliberately broken query")

  test("Bench.timeQuery records a throwing query as a NEGATIVE duration") {
    val t = Bench.timeQuery(boom)
    assert(t < 0, s"expected negative duration for failed query, got $t")
    val ok = Bench.timeQuery(spark.range(3).toDF("id"))
    assert(ok > 0)
  }

  test("Bench.settled marks the query failed if ANY sample failed") {
    assert(Bench.settled(Seq(1.5, -0.3)) == -0.3)
    assert(Bench.settled(Seq(-2.0, -0.5)) == -0.5)
    assert(Bench.settled(Seq(1.5, 0.8)) == 0.8)
    // the magnitude is the fastest FAILURE's time-to-exception: a
    // succeeding retry's duration must not masquerade as a failure time
    assert(Bench.settled(Seq(-2.0, 0.5)) == -2.0)
  }

  test("Verify.writeResult dumps an explicit __verify_error row and the " +
      "failure lands in verify_failures.json") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-fail")
      .toString
    val err = Verify.writeResult(spark, sf001, out, "broken_gate",
      (_: SparkSession, _: String) => boom)
    assert(err.isDefined && err.get.contains("deliberately broken"))
    // the gate's result slot holds an error relation, not a silent gap —
    // the driver's DuckDB compare then reports an explicit FAIL row
    val marker = spark.read.parquet(s"$out/broken_gate")
    assert(marker.columns.toSeq == Seq("__verify_error"))
    assert(marker.count() == 1)
    val ok = Verify.writeResult(spark, sf001, out, "fine_gate",
      (s: SparkSession, _: String) => s.range(2).toDF("id"))
    assert(ok.isEmpty)
    Verify.writeFailures(out, Seq("broken_gate" -> err.get))
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_failures.json"))
    assert(json.contains("broken_gate"))
  }

  test("Verify.writeFailures writes an empty object when green") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-ok")
      .toString
    Verify.writeFailures(out, Nil)
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_failures.json"))
    assert(json.trim == "{}")
  }
}
