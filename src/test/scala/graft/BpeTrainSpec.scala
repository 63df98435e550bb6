package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference BPE (Sennrich's dict formulation). */
  private def refBpe(wordFreq: Map[String, Long], k: Int)
      : Seq[(String, String, Long)] = {
    var vocab = wordFreq.toSeq.map { case (w, f) => (BpeTrain.segment(w), f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var stop = false
    while (r < k && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, rr), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, rr, n))
        vocab = vocab.map { case (s, f) => (BpeTrain.mergeOnce(s, l, rr), f) }
        r += 1
      }
    }
    out.result()
  }

  private def corpusWordFreq: Map[String, Long] =
    Tables.documents(spark, sf001)
      .select(explode(split($"text", " ")).as("w")).filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("learned merges match the reference implementation merge-for-merge") {
    val got = BpeTrain.train(Tables.documents(spark, sf001), k = 12)
      .orderBy($"round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refBpe(corpusWordFreq, 12)
    assert(got == want, s"merge tables diverged:\n got $got\nwant $want")
    assert(got.length == 12, "corpus should support 12 merges")
  }

  test("classic toy corpus learns the expected first merges") {
    // "low" x5, "lowest" x2: first merge must be the most frequent
    // adjacent pair: l+o (7), then lo+w... w carries </w> in "low" only.
    val docs = Seq.fill(5)("low").union(Seq.fill(2)("lowest"))
      .toDF("text")
    val merges = BpeTrain.train(docs, k = 3)
      .orderBy($"round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges.head == (("l", "o", 7L)), s"first merge wrong: $merges")
    assert(merges(1) == (("lo", "w</w>", 5L)) || merges(1) == (("lo", "w", 2L)),
      s"second merge unexpected: ${merges(1)}")
  }

  test("replaying the merge table reproduces training segmentation") {
    val k = 10
    val mergeTable = BpeTrain.train(Tables.documents(spark, sf001), k)
      .orderBy($"round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // reference final vocab after k merges
    var vocab = corpusWordFreq.toSeq.map { case (w, f) =>
      (w, BpeTrain.segment(w)) }
    mergeTable.foreach { case (l, r) =>
      vocab = vocab.map { case (w, s) => (w, BpeTrain.mergeOnce(s, l, r)) }
    }
    vocab.foreach { case (w, s) =>
      assert(BpeTrain.applyMerges(w, mergeTable) == s,
        s"replay diverged for '$w'")
    }
  }

  test("partitioning does not change the learned merges") {
    val a = BpeTrain.train(Tables.documents(spark, sf001), 6)
      .orderBy($"round").collect().map(_.toSeq).toSeq
    val b = BpeTrain.train(Tables.documents(spark, sf001).repartition(7), 6)
      .orderBy($"round").collect().map(_.toSeq).toSeq
    assert(a == b, "repartitioning changed the merge table")
  }

  test("merge table round-trips through parquet in training order") {
    val merges = BpeTrain.train(Tables.documents(spark, sf001), 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    BpeTrain.save(merges, dir)
    val back = BpeTrain.load(spark, dir)
    val want = merges.orderBy($"round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(back == want, "merge table changed across persistence")
    // loaded table must tokenize identically
    assert(BpeTrain.applyMerges("lowest", back) ==
      BpeTrain.applyMerges("lowest", want))
  }

  test("degenerate inputs: empty corpus, single-char words") {
    assert(BpeTrain.train(Seq.empty[String].toDF("text"), 5).count() == 0)
    // single-char words have one symbol ("x</w>") — no pairs, no merges
    assert(BpeTrain.train(Seq("a b c a b").toDF("text"), 5).count() == 0)
    assert(BpeTrain.segment("") == Vector.empty)
  }
}
