package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring: hand-computed toy model, OOV handling, and
  * the degenerate-document edges. The quantized integer surrogate is
  * lnq(c12+1) − lnq(c1+V) with lnq(k) = floor(ln(k)·1e6).
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def lnq(k: Long): Long = math.floor(math.log(k.toDouble) * 1e6).toLong

  test("hand-computed scores on a toy reference") {
    // ref "a b a b": unigrams a:2 b:2 (V=2); bigrams (a,b):2 (b,a):1
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val model = NgramLm.fit(ref)
    assert(model.vocabSize == 2L)
    val docs = Seq(
      (1L, "a b"),   // known bigram: lnq(2+1) - lnq(2+2)
      (2L, "b b"),   // unseen bigram, known w1: lnq(1) - lnq(2+2)
      (3L, "z a"),   // OOV w1: lnq(1) - lnq(0+2)
      (4L, "a"),     // single word: no bigrams
      (5L, "")       // empty: split -> [""], still no bigram
    ).toDF("doc_id", "text")
    val out = NgramLm.score(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, lnq(3) - lnq(4))))
    assert(out(2L) == ((1L, 0L - lnq(4))))
    assert(out(3L) == ((1L, 0L - lnq(2))))
    assert(out(4L) == ((0L, 0L)))
    assert(out(5L) == ((0L, 0L)))
  }

  test("model persists to parquet and scores row-identically after reload") {
    val ref = Tables.documents(spark, sf001).filter(col("source") === "src0")
    val model = NgramLm.fit(ref)
    val docs = Tables.documents(spark, sf001).limit(200)
    val before = NgramLm.score(docs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-model").toString
    NgramLm.save(model, dir)
    model.unpersist()
    val loaded = NgramLm.load(spark, dir)
    val after = NgramLm.score(docs, loaded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    loaded.unpersist()
    assert(before.nonEmpty && before == after,
      s"scores changed across save/load: ${before.diff(after).take(3)}")
  }

  test("reference docs outscore shuffled-register docs under their own model") {
    // the filter's purpose: text drawn from the reference register scores
    // higher per bigram than vocabulary-matched but order-scrambled text
    val ref = (1 to 20).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran to the cat"))
      .toDF("doc_id", "text")
    val model = NgramLm.fit(ref)
    val probe = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "mat the on cat the sat")).toDF("doc_id", "text")
    val s = NgramLm.score(probe, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(2).toDouble / r.getLong(1))).toMap
    assert(s(100L) > s(101L),
      s"in-register text must outscore scrambled text: $s")
  }
}
