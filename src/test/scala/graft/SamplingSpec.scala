package graft

import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("JVM knuth32 twin is bit-equal to the Column form, negatives included") {
    val ids = Seq(0L, 1L, 65535L, 65536L, -1L, -65536L,
      3470000000L, -3470000000L, Long.MaxValue, Long.MinValue,
      Long.MinValue + 1, 2654435761L) ++
      (0 until 200).map(i => i * 982451653L - 77777777777L)
    val fromCol = ids.toDF("id")
      .select(col("id"), Dedup.knuth32(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(Sampling.knuth32(id) == fromCol(id),
        s"id $id: jvm ${Sampling.knuth32(id)} != col ${fromCol(id)}")
    }
  }

  test("bottom-k sample equals the window formulation under adversarial partitioning") {
    val rows = (0L until 5000L).map(id => (id, s"g${id % 7}"))
    val df = rows.toDF("id", "g").repartition(13)
    val viaAgg = df.groupBy($"g")
      .agg(Sampling.bottomK($"id", 10).as("sample"))
      .select($"g", posexplode($"sample").as(Seq("pos", "id")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"g").orderBy(Dedup.knuth32($"id"), $"id")
    val viaWindow = df
      .withColumn("pos", row_number().over(w) - 1)
      .filter($"pos" < 10)
      .select($"g", $"pos", $"id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 70) // 7 groups x 10
  }

  test("a smaller sample is a prefix of a larger one (rank stability)") {
    val df = (0L until 2000L).toDF("id").repartition(5)
    def sample(k: Int): Seq[Long] =
      df.agg(Sampling.bottomK($"id", k).as("s")).head().getSeq[Long](0)
    val s5 = sample(5)
    val s20 = sample(20)
    assert(s20.take(5) == s5)
    assert(s20.length == 20 && s20.distinct.length == 20)
  }

  test("duplicate ids collapse: the sketch stays a set sample") {
    val df = (0L until 100L).flatMap(id => Seq(id, id, id)).toDF("id")
      .repartition(9)
    val s = df.agg(Sampling.bottomK($"id", 15).as("s")).head().getSeq[Long](0)
    assert(s.length == 15 && s.distinct.length == 15)
  }

  test("weighted sample equals brute-force A-ES keys under adversarial partitioning") {
    val rows = (0L until 3000L).map(id => (id, 1.0 + (id % 5).toDouble))
    val viaAgg = rows.toDF("id", "w").repartition(11)
      .agg(Sampling.weightedK($"id", $"w", 25).as("s"))
      .head().getSeq[Long](0)
    val brute = rows.map { case (id, w) => (Sampling.esKey(id, w), id) }
      .sorted.take(25).map(_._2)
    assert(viaAgg == brute)
  }

  test("equal weights degenerate the weighted draw to a uniform one") {
    val df = (0L until 1000L).toDF("id").repartition(7)
    val weighted = df.agg(
      Sampling.weightedK($"id", lit(3.0), 15).as("s")).head().getSeq[Long](0)
    // -ln(u)/c is monotone DECREASING in the hash, so the equal-weight
    // sample is exactly the 15 LARGEST knuth32 hashes
    val brute = (0L until 1000L)
      .map(id => (Sampling.knuth32(id), id)).sortBy(t => (-t._1, t._2))
      .take(15).map(_._2)
    assert(weighted.toSet == brute.toSet)
  }

  test("heavier items are strongly overrepresented in the weighted draw") {
    // 100 heavy items (w=10) among 900 light (w=1): heavies are 10% of the
    // population but ~10/19 of the total weight
    val rows = (0L until 1000L).map(id => (id, if (id < 100) 10.0 else 1.0))
    val sample = rows.toDF("id", "w").repartition(5)
      .agg(Sampling.weightedK($"id", $"w", 100).as("s"))
      .head().getSeq[Long](0)
    val nHeavy = sample.count(_ < 100L)
    assert(nHeavy >= 30, s"only $nHeavy/100 heavy items sampled")
    // and non-positive weights never appear
    val withZero = (rows ++ Seq((5000L, 0.0), (5001L, -3.0)))
      .toDF("id", "w")
      .agg(Sampling.weightedK($"id", $"w", 2000).as("s"))
      .head().getSeq[Long](0)
    assert(!withZero.contains(5000L) && !withZero.contains(5001L))
  }

  test("buffer invariants: sorted, bounded, deduped under random merges") {
    val rng = new scala.util.Random(42)
    val ids = Vector.fill(500)(rng.nextLong() % 1000L)
    val k = 16
    // split into partials, reduce each, merge pairwise in shuffled order
    val partials = ids.grouped(37).map(
      _.foldLeft(Vector.empty[(Long, Long)])((b, id) => Sampling.insert(b, id, k)))
    val merged = rng.shuffle(partials.toVector)
      .reduce((a, b) => Sampling.mergeBufs(a, b, k))
    val expected = ids.distinct
      .map(id => (Sampling.knuth32(id), id)).sorted.take(k)
    assert(merged == expected)
  }
}
