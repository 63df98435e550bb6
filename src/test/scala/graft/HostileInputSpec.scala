package graft

import org.apache.spark.sql.functions._

/** Degenerate and hostile inputs through the text-operator surface: nulls,
  * empty strings, single tokens, unicode (CJK/emoji/RTL), exotic
  * whitespace, and very long repeated content. The contract under test is
  * "no crash, no null-poisoned output where the operator defines a
  * default" — the property a 100 TB ingest needs, because at that scale
  * every degenerate shape WILL occur.
  */
class HostileInputSpec extends SparkSpec {
  import spark.implicits._

  private val hostile = Seq(
    (1L, null.asInstanceOf[String], "src0"),
    (2L, "", "src0"),
    (3L, " ", "src0"),
    (4L, "single", "src0"),
    (5L, "你好世界 こんにちは", "src1"), // CJK
    (6L, "😀 🎉 emoji only 💩", "src1"),
    (7L, "مرحبا rtl text here", "src1"),
    (8L, "tab\tsep\nnewline\rcarriage", "src2"),
    (9L, ("repeat " * 5000).trim, "src2"), // 30k chars
    (10L, (0 until 2000).map(i => s"t$i").mkString(" "), "src2"))

  private def docs = hostile.toDF("doc_id", "text", "source")

  test("scalar text functions: no exceptions, sane defaults on null/empty") {
    val out = docs.select($"doc_id",
      graft.functions.TextOps.qualityScore($"text").as("q"),
      graft.functions.TextOps.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    // non-null rows produce finite scores
    (3L to 10L).foreach { id =>
      out(id)._1.foreach(q => assert(!q.asInstanceOf[Double].isNaN))
    }
    assert(out.size == hostile.size)
  }

  test("minhash signatures and banding survive the hostile corpus") {
    val nonNull = docs.na.fill("", Seq("text"))
    val sigs = graft.operators.Dedup.minhashSignatures(nonNull)
    // the documented contract: docs too short to shingle (< 3 words) have
    // NO signature row — they cannot near-dup-match, and every downstream
    // consumer (candidates → canonicalize → split) treats unsigned docs as
    // their own singleton cluster rather than crashing or mis-pairing
    val signed = sigs.select($"doc_id").collect().map(_.getLong(0)).toSet
    val longEnough = hostile.filter(h =>
      h._2 != null && h._2.split(" ", -1).length >= 3).map(_._1).toSet
    assert(signed == longEnough, s"signed $signed vs expected $longEnough")
    graft.operators.Dedup.minhashCandidates(sigs).collect() // must not throw
  }

  test("CDC chunking: reconstruction holds for every hostile shape") {
    val chunks = graft.operators.Cdc.chunkDocuments(docs)
    val rebuilt = chunks.orderBy($"doc_id", $"chunk_idx")
      .groupBy($"doc_id")
      .agg(concat_ws(" ", collect_list($"chunk_text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hostile.filter(h => h._2 != null).foreach { case (id, text, _) =>
      val expected = text.split(" ").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt.getOrElse(id, "") == expected, s"doc $id")
    }
  }

  test("DSIR scoring: null and empty docs get weight 0, others finite") {
    val counts = graft.operators.Dsir.bucketCounts(docs.na.fill("", Seq("text")))
    val w = graft.operators.Dsir.importanceWeights(docs, counts, counts)
      .select($"doc_id", $"dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) == 0.0 && w(2L) == 0.0 && w(4L) == 0.0)
    w.values.foreach(v => assert(!v.isNaN && !v.isInfinite))
  }

  test("bottom-k sampling, fingerprint canonicalization on unicode groups") {
    val sample = docs.groupBy($"source")
      .agg(graft.operators.Sampling.bottomK($"doc_id", 2).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sample.values.forall(s => s.nonEmpty && s.length <= 2))
    // gopher rules over unicode: booleans, never exceptions
    docs.na.fill("", Seq("text"))
      .select(graft.functions.TextOps.gopherRules($"text").as("r"))
      .collect()
  }

  test("duplicate-span dedup: hostile corpus scrubs without loss or crash") {
    // the 30k-char "repeat repeat ..." doc self-duplicates massively; the
    // null/empty/single docs must pass through untouched
    val out = graft.operators.DupSpans.scrub(docs.select($"doc_id", $"text"), 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_tokens_before"),
          r.getAs[Long]("n_tokens_removed")))).toMap
    assert(out.size == hostile.size)
    // repeat-doc: all 4996 windows carry the identical gram; only the
    // pos-0 window is the corpus-first occurrence, so the merged redundant
    // span is [1, 5000) and a single leading token survives
    val (text9, before9, removed9) = out(9L)
    assert(before9 == 5000L && removed9 == 4999L && text9 == "repeat")
    // short/degenerate docs untouched (no window reaches k=5)
    Seq(2L, 3L, 4L, 5L, 6L).foreach { id =>
      assert(out(id)._3 == 0L, s"doc $id scrubbed unexpectedly")
    }
    // only the repeat-doc loses tokens; every other hostile shape is
    // untouched, with sane zero counts on null/empty text
    out.foreach { case (id, (_, before, removed)) =>
      assert(removed >= 0 && removed <= before, s"doc $id counts insane")
      if (id != 9L) assert(removed == 0L, s"doc $id scrubbed unexpectedly")
    }
    assert(out(1L)._2 == 0L) // null text = zero tokens, not null-poisoned
  }

  test("top-n-gram and streaming scrub survive the hostile corpus") {
    val grams = graft.operators.Dedup.benchmarkGrams(
      Seq((100L, "repeat repeat repeat repeat repeat")).toDF("doc_id", "text"),
      n = 5).select($"__gram".as("gram"))
    val out = graft.streaming.StreamingDecontaminate
      .scrubStream(docs, grams, 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_tokens_removed")).toMap
    assert(out(9L) == 5000L) // the whole repeat-doc is benchmark text
    assert(out(1L) == 0L && out(2L) == 0L)
    // ngrams on nulls/unicode: arrays, never exceptions
    docs.select(graft.functions.TextOps.ngrams($"text", 3)).collect()
  }
}
