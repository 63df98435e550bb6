package graft

import graft.operators.QuantileSketch
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val probeQs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** Exact quantile under the engine's rank convention: smallest v whose
    * rank (count ≤ v) reaches ceil(q·n).
    */
  private def exactQ(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    s(math.max(1L, math.ceil(q * s.length).toLong).toInt - 1)
  }

  private def artOf(row: org.apache.spark.sql.Row): Seq[Seq[Double]] =
    row.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
      .map(_.toSeq).toSeq

  private def sketchOf(xs: Seq[Double], parts: Int, k: Int = 256)
      : Seq[Seq[Double]] =
    artOf(xs.toDF("x").repartition(parts)
      .agg(QuantileSketch.sketch($"x", k).as("sk"))
      .collect()(0))

  test("exact regime: n <= k answers every quantile exactly") {
    val xs = Tables.orders(spark, sf01).filter($"o_orderkey" < 240)
      .select($"o_totalprice").as[Double].collect().toSeq
    assert(xs.length <= 256, "slice outgrew the exact regime — fix the test")
    Seq(1, 7).foreach { parts =>
      val art = sketchOf(xs, parts)
      probeQs.foreach { q =>
        assert(QuantileSketch.quantile(art, q) == exactQ(xs, q),
          s"q=$q parts=$parts diverged in the exact regime")
      }
    }
  }

  test("approximate regime: rank error <= 2% of N on 60k real prices") {
    val xs = Tables.lineitem(spark, sf01)
      .select($"l_extendedprice").as[Double].collect().toSeq
    val n = xs.length
    assert(n > 10000, "need a real approximate-regime corpus")
    val sorted = xs.sorted
    // adversarial layouts: one partition, many partitions, pre-sorted,
    // reverse-sorted — compaction bias must stay bounded under all
    val layouts = Seq(
      sketchOf(xs, 1), sketchOf(xs, 64),
      sketchOf(sorted, 8), sketchOf(sorted.reverse, 8))
    layouts.zipWithIndex.foreach { case (art, i) =>
      probeQs.foreach { q =>
        val est = QuantileSketch.quantile(art, q)
        val rank = sorted.count(_ <= est)
        val err = math.abs(rank - math.ceil(q * n))
        assert(err <= n * 0.02,
          s"layout $i q=$q: rank err $err on n=$n (est=$est)")
      }
    }
  }

  test("union of per-group sketches stays within the same error class") {
    val df = Tables.lineitem(spark, sf01)
      .select($"l_suppkey" % 13 as "g", $"l_extendedprice".as("x"))
    val art = artOf(df.groupBy($"g").agg(QuantileSketch.sketch($"x").as("sk"))
      .agg(QuantileSketch.unionSketch($"sk").as("u"))
      .collect()(0))
    val sorted = df.select($"x").as[Double].collect().sorted
    val n = sorted.length
    probeQs.foreach { q =>
      val est = QuantileSketch.quantile(art, q)
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - math.ceil(q * n)) <= n * 0.02,
        s"union q=$q rank err on n=$n")
    }
  }

  test("total weight is conserved exactly through compaction and merge") {
    val xs = (1 to 50000).map(_.toDouble)
    Seq(1, 32).foreach { parts =>
      val art = sketchOf(xs, parts)
      val w = art.zipWithIndex.map { case (l, i) => l.length.toLong << i }.sum
      assert(w == xs.length, s"parts=$parts: weight $w != ${xs.length}")
    }
  }

  test("state stays O(k log n): level sizes bounded by k") {
    val art = sketchOf((1 to 200000).map(_.toDouble), 16, k = 128)
    assert(art.forall(_.length <= 128), "a level outgrew its capacity")
    assert(art.map(_.length).sum < 128 * art.length + 1)
    assert(art.length < 20, "level count should be logarithmic")
  }

  test("artifact round-trips through parquet with identical answers") {
    val xs = Tables.lineitem(spark, sf001)
      .select($"l_extendedprice").as[Double].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("kll").toString
    Tables.lineitem(spark, sf001)
      .agg(QuantileSketch.sketch($"l_extendedprice").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val back = artOf(spark.read.parquet(dir).collect()(0))
    val art = sketchOf(xs, 1)
    probeQs.foreach { q =>
      assert(QuantileSketch.quantile(back, q) ==
        QuantileSketch.quantile(art, q), s"q=$q changed across persistence")
    }
  }

  test("streaming twin: union of shard states answers like the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val xs = Tables.lineitem(spark, sf001)
      .select($"l_extendedprice").as[Double].collect().toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Double]
    val query = graft.streaming.StreamingKll
      .quantileSketch(stream.toDF().toDF("x"), nShards = 4)
      .writeStream.format("memory").queryName("kll_stream_test")
      .outputMode("append").start()
    try {
      // three uneven micro-batches — state must carry across
      val (b1, rest) = xs.splitAt(xs.length / 5)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => stream.addData(b); query.processAllAvailable() }
      // last emitted artifact per shard = final state snapshot
      val finals = spark.table("kll_stream_test")
        .withColumn("seq", monotonically_increasing_id())
        .orderBy($"seq".desc).collect()
        .groupBy(_.getInt(0)).map { case (_, rows) => rows.head }
      val sorted = xs.sorted
      val n = sorted.length
      // union the shard artifacts through the real union path
      val arts = finals.toSeq
        .map(r => r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](1)
          .map(_.toSeq).toSeq)
      val art = artOf(arts.toDF("sk")
        .agg(QuantileSketch.unionSketch($"sk").as("u")).collect()(0))
      probeQs.foreach { q =>
        val est = QuantileSketch.quantile(art, q)
        val rank = sorted.count(_ <= est)
        assert(math.abs(rank - math.ceil(q * n)) <= math.max(1.0, n * 0.02),
          s"streamed q=$q rank err on n=$n")
      }
    } finally query.stop()
  }

  test("NaN values are excluded, never ranked or sort-poisoning") {
    val xs = Seq(3.0, Double.NaN, 1.0, Double.NaN, 2.0)
    val art = sketchOf(xs, 2)
    val w = art.zipWithIndex.map { case (l, i) => l.length.toLong << i }.sum
    assert(w == 3L, s"NaN leaked into the sketch (weight $w)")
    assert(QuantileSketch.quantile(art, 0.5) == 2.0)
    // a NaN flood with real values interleaved must not corrupt compaction
    val flood = (1 to 5000).flatMap(i => Seq(i.toDouble, Double.NaN))
    val big = sketchOf(flood, 8, k = 64)
    val est = QuantileSketch.quantile(big, 0.5)
    assert(!est.isNaN && math.abs(est - 2500.0) <= 5000 * 0.05,
      s"median after NaN flood: $est")
  }

  test("degenerate inputs: empty, single value, all-equal") {
    assert(QuantileSketch.quantile(Seq(Seq.empty[Double]), 0.5).isNaN)
    val one = sketchOf(Seq(42.0), 1)
    assert(QuantileSketch.quantile(one, 0.0) == 42.0)
    assert(QuantileSketch.quantile(one, 1.0) == 42.0)
    val flat = sketchOf(Vector.fill(5000)(7.0), 8)
    probeQs.foreach(q => assert(QuantileSketch.quantile(flat, q) == 7.0))
  }
}
