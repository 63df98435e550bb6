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
