package graft

import graft.operators.DupSpans
import org.apache.spark.sql.functions._

class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("a passage shared by two docs: only the later copy becomes a span") {
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta unique0 tail0",
      1L -> "head1 alpha beta gamma delta epsilon zeta tail1")
    val spans = DupSpans.dupSpans(d, k = 5).collect()
    // the 6-token passage in doc 1 spans tokens [1, 7); its duplicated
    // 5-windows (pos 1 and 2) merge into that one maximal span
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 7L)))
    assert(spans.head.getAs[Long]("n_tokens") == 6L)
  }

  test("scrub removes the later copy, keeps the first, rebuilds text") {
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta unique0 tail0",
      1L -> "head1 alpha beta gamma delta epsilon zeta tail1")
    val out = DupSpans.scrub(d, k = 5).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") ==
      "alpha beta gamma delta epsilon zeta unique0 tail0")
    assert(out(0).getAs[Long]("n_tokens_removed") == 0L)
    assert(out(1).getAs[String]("text") == "head1 tail1")
    assert(out(1).getAs[Long]("n_tokens_removed") == 6L)
    assert(out(1).getAs[Long]("n_tokens_before") == 8L)
  }

  test("within-doc repetition: the second occurrence is scrubbed") {
    val rep = "one two three four five"
    val d = docs(0L -> s"$rep filler $rep")
    val out = DupSpans.scrub(d, k = 5).collect()(0)
    assert(out.getAs[String]("text") == s"$rep filler")
    assert(out.getAs[Long]("n_tokens_removed") == 5L)
  }

  test("overlapping and adjacent duplicated windows merge maximally") {
    // doc1 duplicates doc0's tokens 0..9 wholesale: windows 0..5 are all
    // redundant in doc1 and must merge into a single [0, 10) span
    val ten = "a b c d e f g h i j"
    val d = docs(0L -> s"$ten tail0", 1L -> s"$ten tail1")
    val spans = DupSpans.dupSpans(d, k = 5)
      .filter($"doc_id" === 1L).collect()
    assert(spans.length == 1)
    assert(spans(0).getAs[Long]("span_start") == 0L)
    assert(spans(0).getAs[Long]("span_end") == 10L)
  }

  test("docs shorter than k yield no windows and scrub is identity") {
    val d = docs(0L -> "tiny doc", 1L -> "tiny doc")
    assert(DupSpans.windowOccurrences(d, 5).count() == 0)
    val out = DupSpans.scrub(d, 5).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text")).toSeq ==
      Seq("tiny doc", "tiny doc"))
    assert(out.forall(_.getAs[Long]("n_tokens_removed") == 0L))
  }

  test("fully-duplicated doc scrubs to empty text") {
    val five = "p q r s t"
    val d = docs(0L -> s"$five extra", 1L -> five)
    val out = DupSpans.scrub(d, 5).filter($"doc_id" === 1L).collect()(0)
    assert(out.getAs[String]("text") == "")
    assert(out.getAs[Long]("n_tokens_removed") == 5L)
  }

  test("operator output matches an independent in-memory reimplementation") {
    // random corpus with planted repetition; verify redundant-occurrence
    // selection and island merge against a naive driver-side replay
    val rnd = new scala.util.Random(7)
    val vocab = Array("w0", "w1", "w2", "w3", "w4", "w5")
    val base = Array.fill(40)(vocab(rnd.nextInt(vocab.length)))
    val texts = (0 until 12).map { i =>
      val start = rnd.nextInt(30)
      val len = 5 + rnd.nextInt(10)
      val words = Array.fill(20)(vocab(rnd.nextInt(vocab.length))) ++
        base.slice(start, start + len) ++
        Array.fill(10)(vocab(rnd.nextInt(vocab.length)))
      (i.toLong, words.mkString(" "))
    }
    val k = 5
    // naive replay
    val occ = texts.flatMap { case (id, t) =>
      val w = t.split(" ")
      (0 to w.length - k).map(p => (id, p, w.slice(p, p + k).mkString(" ")))
    }
    val firsts = occ.groupBy(_._3).map { case (g, os) =>
      g -> os.map(o => (o._1, o._2)).min
    }
    val red = occ.filter(o => firsts(o._3) != ((o._1, o._2)))
      .map(o => (o._1, o._2)).sorted
    val expSpans = red.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val islands = sorted.tail.foldLeft(List((sorted.head, sorted.head + k))) {
        case (acc @ ((s0, e0) :: rest), p) =>
          if (p > e0) (p, p + k) :: acc else (s0, math.max(e0, p + k)) :: rest
        case (Nil, p) => List((p, p + k))
      }
      islands.reverse.map { case (st, en) => (id, st.toLong, en.toLong) }
    }.toSet
    val got = DupSpans.dupSpans(texts.toDF("doc_id", "text"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expSpans)
  }

  test("cross-set contamination: bench text inside a corpus doc is located and scrubbed") {
    val bench = docs(100L -> "the quick brown fox jumps over dog")
    val corpus = docs(
      0L -> "intro words here the quick brown fox jumps over outro",
      1L -> "totally unrelated content with no benchmark overlap at all")
    val spans = DupSpans.contaminatedSpans(corpus, bench, k = 5)
      .orderBy($"doc_id", $"span_start").collect()
    // doc 0 tokens 3..8 = "the quick brown fox jumps over": 5-windows at
    // pos 3 and 4 both occur in bench => one span [3, 9)
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 3L, 9L)))
    val scrubbed = DupSpans
      .scrubWith(corpus, DupSpans.contaminatedSpans(corpus, bench, 5))
      .orderBy($"doc_id").collect()
    assert(scrubbed(0).getAs[String]("text") == "intro words here outro")
    assert(scrubbed(1).getAs[Long]("n_tokens_removed") == 0L)
  }

  test("contamination hits EVERY corpus copy — no first-occurrence exemption") {
    val bench = docs(100L -> "a b c d e")
    val corpus = docs(0L -> "a b c d e x", 1L -> "y a b c d e")
    val spans = DupSpans.contaminatedSpans(corpus, bench, k = 5)
      .orderBy($"doc_id").collect()
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 0L, 5L), (1L, 1L, 6L)))
  }

  test("row-local streaming scrub ≡ relational contaminatedSpans + scrubWith") {
    val all = Tables.documents(spark, sf01)
    val corpus = all.filter($"doc_id" % 50 =!= 0)
    val bench = all.filter($"doc_id" % 50 === 0)
    val relational = DupSpans
      .scrubWith(corpus, DupSpans.contaminatedSpans(corpus, bench, 8))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("n_tokens_removed"))).toSet
    val grams = graft.operators.Dedup.benchmarkGrams(bench, n = 8)
      .select($"__gram".as("gram"))
    val rowLocal = graft.streaming.StreamingDecontaminate
      .scrubStream(corpus, grams, k = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("n_tokens_removed"))).toSet
    assert(rowLocal == relational)
    assert(rowLocal.exists(_._3 > 0), "no contamination found — test is vacuous")
  }

  test("incremental spans: vs-corpus and within-batch hits merge; corpus untouched") {
    val corpus = docs(0L -> "old corpus text alpha beta gamma delta")
    val rep = "one two three four five"
    val batch = docs(
      // shares a 5-gram with the corpus AND repeats one internally
      3L -> s"corpus text alpha beta gamma tail $rep",
      6L -> s"fresh start here $rep closing words now")
    val spans = DupSpans.incrementalSpans(corpus, batch, k = 5)
      .orderBy($"doc_id", $"span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 3: tokens 0..4 "corpus text alpha beta gamma" hit the corpus
    // (its window at pos 1..5? corpus has "corpus text alpha beta gamma"?)
    // corpus windows include "corpus text alpha beta gamma" at pos 1 =>
    // doc3 pos0 window matches => span [0,5). doc 6 carries the batch's
    // SECOND copy of the repeated phrase at tokens 3..7 => span [3,8);
    // doc 3's copy (pos 6) is the batch-first occurrence and stays
    assert(spans == Seq((3L, 0L, 5L), (6L, 3L, 8L)))
  }

  test("scrub removal count equals total merged span length per doc") {
    val d = Tables.documents(spark, sf01).limit(200)
    val spans = DupSpans.dupSpans(d, 5)
    val bySpan = spans.groupBy($"doc_id")
      .agg(sum($"n_tokens").as("removed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byScrub = DupSpans.scrubWith(d, spans)
      .filter($"n_tokens_removed" > 0)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens_removed")).toMap
    assert(byScrub == bySpan)
  }
}
