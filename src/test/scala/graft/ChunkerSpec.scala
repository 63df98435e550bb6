package graft

import graft.operators.Chunker
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(s: String) = s.split(" ", -1)

  test("window geometry: starts stride apart, overlap shared, tail rule") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val ch = Chunker.chunk(docs, size = 32, overlap = 8)
      .orderBy("chunk_idx").collect()
    // 100 tokens, stride 24: 1 + ceil(68/24) = 4 chunks
    assert(ch.length == 4)
    assert(ch.map(_.getAs[Long]("token_start")).toSeq == Seq(0L, 24L, 48L, 72L))
    assert(ch.map(_.getAs[Long]("n_tokens")).toSeq == Seq(32L, 32L, 32L, 28L))
    // consecutive chunks share exactly `overlap` tokens
    val texts = ch.map(_.getAs[String]("chunk_text")).map(toksOf)
    texts.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(8).toSeq == b.take(8).toSeq)
    }
    // every token of the document appears in at least one chunk, in order
    assert(texts.map(_.take(24)).reduce(_ ++ _).take(72).toSeq ++
      texts.last.toSeq ==
      toksOf(text).toSeq.take(72) ++ texts.last.toSeq)
    // chunk_uid is the stable (doc, idx) identity
    assert(ch.map(_.getAs[String]("chunk_uid")).toSeq ==
      Seq("1#0", "1#1", "1#2", "1#3"))
  }

  test("short and exact-fit docs yield one chunk; zero-overlap partitions exactly") {
    val docs = Seq(
      (1L, (1 to 10).map("w" + _).mkString(" ")),
      (2L, (1 to 32).map("w" + _).mkString(" ")),
      (3L, (1 to 33).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val counts = Chunker.chunk(docs, 32, 8).groupBy("doc_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    // overlap 0: chunks tile the document with no token repeated
    val tiled = Chunker.chunk(docs.filter($"doc_id" === 3L), 8, 0)
      .orderBy("chunk_idx").collect()
    assert(tiled.map(_.getAs[Long]("n_tokens")).sum == 33L)
    assert(tiled.flatMap(r => toksOf(r.getAs[String]("chunk_text"))).toSeq ==
      (1 to 33).map("w" + _))
  }

  test("deterministic, map-only (no exchange), and guards reject bad dials") {
    val docs = Tables.documents(spark, sf001).filter($"doc_id" < 50)
    val a = Chunker.chunk(docs, 32, 8).collect().map(_.toString).sorted.toSeq
    val b = Chunker.chunk(docs.repartition(7), 32, 8).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
    val plan = Chunker.chunk(docs, 32, 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must be map-only:\n$plan")
    intercept[IllegalArgumentException] { Chunker.chunk(docs, 0, 0) }
    intercept[IllegalArgumentException] { Chunker.chunk(docs, 8, 8) }
  }

  test("null text yields one empty chunk, never a silent drop") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ch = Chunker.chunk(docs, 4, 0).collect()
    assert(ch.length == 2, "null-text doc dropped from the chunk table")
    val nullChunk = ch.find(_.getLong(0) == 2L).get
    assert(nullChunk.getAs[String]("chunk_text") == "" &&
      nullChunk.getAs[Long]("chunk_idx") == 0L)
    // no phantom tokens: an empty/null doc is 0 tokens, not 1 — the
    // whitespace and BPE granularities must AGREE on the same corpus
    assert(nullChunk.getAs[Long]("n_tokens") == 0L)
    // same contract on the BPE form
    val merges = Seq(("a", "b</w>"))
    val bch = Chunker.chunkByBpe(docs, 4, 0, merges).collect()
    assert(bch.length == 2 &&
      bch.find(_.getLong(0) == 2L).get.getAs[String]("chunk_text") == "")
    assert(bch.find(_.getLong(0) == 2L).get.getAs[Long]("n_tokens") == 0L)
    // consecutive whitespace collapses identically in both forms: token
    // counts agree word-for-word (identity merges: 1 word = 1 token)
    val messy = Seq((3L, "a  b   c")).toDF("doc_id", "text")
    val wTok = Chunker.chunk(messy, 4, 0).collect()
      .map(_.getAs[Long]("n_tokens")).sum
    assert(wTok == 3L, s"empty split tokens counted: $wTok")
  }

  test("chunkByBpe: budget counted in BPE tokens, geometry matches the tail rule") {
    // 12 identical 2-token words ([h, i</w>] under an irrelevant merge
    // table) -> 24 BPE tokens total vs 12 whitespace words: the
    // whitespace chunker under-fills a token budget systematically
    val merges = Seq(("z", "z</w>"))
    val docs = Seq((1L, Seq.fill(12)("hi").mkString(" "))).toDF("doc_id", "text")
    assert(Chunker.chunk(docs, 10, 2).count() == 2L) // 12 words
    val ch = Chunker.chunkByBpe(docs, 10, 2, merges)
      .orderBy("chunk_idx").collect()
    // 24 tokens, size 10, stride 8: 1 + ceil(14/8) = 3 chunks
    assert(ch.length == 3)
    assert(ch.map(_.getAs[Long]("token_start")).toSeq == Seq(0L, 8L, 16L))
    assert(ch.map(_.getAs[Long]("n_tokens")).toSeq == Seq(10L, 10L, 8L))
    // 10 tokens = 5 whole words; the word-boundary end keeps its
    // </w>-derived trailing space (faithful detokenization)
    assert(ch(0).getAs[String]("chunk_text") == Seq.fill(5)("hi ").mkString)
    assert(ch(2).getAs[String]("chunk_text") == Seq.fill(4)("hi ").mkString)
  }

  test("chunkByBpe: overlap-0 chunk texts concatenate to the normalized document") {
    // faithful detokenization: a chunk ending mid-word carries the
    // partial word with NO trailing space, one ending on a word boundary
    // keeps its </w>-derived space — so plain concatenation of the
    // texts reconstructs the document exactly (terminal space included)
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    for (merges <- Seq(Seq.empty[(String, String)],
        Seq(("a", "l"), ("e", "t"), ("al", "p")))) {
      val ch = Chunker.chunkByBpe(docs, 7, 0, merges).orderBy("chunk_idx").collect()
      val joined = ch.map(_.getAs[String]("chunk_text")).mkString("")
      assert(joined == "alpha beta gamma delta epsilon zeta ",
        s"reconstruction broke for merges=$merges: '$joined'")
      // every window respects the BPE budget
      assert(ch.map(_.getAs[Long]("n_tokens")).forall(_ <= 7L))
    }
  }

  test("chunkByBpe is deterministic and map-only like the whitespace form") {
    val merges = Seq(("t", "h"), ("th", "e</w>"))
    val docs = Tables.documents(spark, sf001).filter($"doc_id" < 50)
    val a = Chunker.chunkByBpe(docs, 16, 4, merges).collect()
      .map(_.toString).sorted.toSeq
    val b = Chunker.chunkByBpe(docs.repartition(7), 16, 4, merges).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
    val plan = Chunker.chunkByBpe(docs, 16, 4, merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE chunking must be map-only:\n$plan")
  }

  test("chunk table feeds the downstream consumers: hash dedup and BM25 index") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h")).toDF("doc_id", "text") // exact twins
    val ch = Chunker.chunk(docs, 4, 0)
    // identical content -> identical chunk_hash across docs
    assert(ch.groupBy("chunk_hash").agg(count(lit(1)).as("n"))
      .filter($"n" === 2).count() == 2L)
    val idx = graft.operators.InvertedIndex.build(
      ch.select($"chunk_uid", $"chunk_text"),
      idCol = "chunk_uid", textCol = "chunk_text")
    assert(idx.n == 4L && idx.avgdl == 4.0)
  }
}
