package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val idxDir =
    java.nio.file.Files.createTempDirectory("graft-lexidx-spec").toString
  private lazy val built =
    InvertedIndex.build(Tables.documents(spark, sf001))

  test("build: doc lengths and dfs are consistent rollups of the postings") {
    val fromPostings = built.postings.groupBy($"doc_id")
      .agg(sum($"tf").as("dl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dl = built.docLens.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == fromPostings)
    assert(built.n == Tables.documents(spark, sf001).count())
    val sdl = dl.values.sum
    assert(built.avgdl == sdl.toDouble / built.n)
  }

  test("build drops empty tokens: trailing/doubled spaces index no phantom term") {
    val docs = Seq((1L, "alpha beta "), (2L, " alpha  beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    assert(idx.postings.filter(length($"term") === 0).count() == 0)
    val dl = idx.docLens.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == Map(1L -> 2L, 2L -> 2L, 3L -> 1L)) // real tokens only
    assert(idx.n == 3 && idx.sdl == 5)
  }

  test("phraseTopK: anchors, repeated terms, overlaps, and the positional artifact") {
    val docs = Seq(
      (1L, "big cat sat"),            // one "big cat"
      (2L, "big cat big cat big"),    // two "big cat", trailing lone big
      (3L, "cat big"),                // reversed — no match
      (4L, "big  cat"),               // doubled space must not break adjacency
      (5L, "x x x"),                  // overlapping "x x" twice
      (6L, "big")                     // phrase longer than doc
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, withPositions = true)
    def runPhrase(i: InvertedIndex.LexIndex, ph: Seq[String]) =
      InvertedIndex.phraseTopK(i, ph, 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(runPhrase(idx, Seq("big", "cat")) ==
      Seq(2L -> 2L, 1L -> 1L, 4L -> 1L))
    assert(runPhrase(idx, Seq("x", "x")) == Seq(5L -> 2L)) // overlap counts
    assert(runPhrase(idx, Seq("big", "cat", "big")) == Seq(2L -> 2L))
    assert(runPhrase(idx, Seq("cat", "sat")) == Seq(1L -> 1L))
    assert(runPhrase(idx, Seq("absent", "cat")).isEmpty)
    // a positionless index must refuse, not silently mis-answer
    val flat = InvertedIndex.build(docs)
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseTopK(flat, Seq("big", "cat"), 10)
    }
    // positions survive save -> append -> load -> compact
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-pos-spec").toString
    InvertedIndex.save(idx, dir)
    InvertedIndex.append(dir,
      Seq((7L, "big cat big cat big cat")).toDF("doc_id", "text"))
    val appended = InvertedIndex.load(spark, dir)
    assert(runPhrase(appended, Seq("big", "cat")) ==
      Seq(7L -> 3L, 2L -> 2L, 1L -> 1L, 4L -> 1L))
    InvertedIndex.delete(spark, dir, Seq(2L))
    InvertedIndex.compact(spark, dir)
    val compacted = InvertedIndex.load(spark, dir)
    assert(compacted.postings.columns.contains("positions"),
      "compact dropped the positions column")
    assert(runPhrase(compacted, Seq("big", "cat")) ==
      Seq(7L -> 3L, 1L -> 1L, 4L -> 1L))
  }

  test("phraseTopKByQuery: batch ranking equals per-query phraseTopK; Among twin; slot contract") {
    val docs = Seq(
      (1L, "big cat sat"), (2L, "big cat big cat big"), (3L, "cat big"),
      (4L, "big  cat"), (5L, "x x x"), (6L, "big")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, withPositions = true)
    val phrases = Seq(0L -> Seq("big", "cat"), 1L -> Seq("x", "x"),
      2L -> Seq("cat", "sat"))
    val queries = (phrases.flatMap { case (qid, ph) =>
      ph.zipWithIndex.map { case (t, s) => (qid, s, t) }
    } ++ Seq((3L, 0, "absent"))).toDF("query_id", "slot", "term")
    def sorted(rows: Seq[(Long, Long, Long)]) =
      rows.sortBy(t => (t._1, -t._3, t._2))
    def batchRows(df: org.apache.spark.sql.DataFrame) = sorted(df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    def perQuery(f: Seq[String] => org.apache.spark.sql.DataFrame) =
      sorted(phrases.flatMap { case (qid, ph) =>
        f(ph).collect().map(r => (qid, r.getLong(0), r.getLong(1))).toSeq
      })
    val got = batchRows(InvertedIndex.phraseTopKByQuery(idx, queries, 10))
    assert(got.nonEmpty &&
      got == perQuery(ph => InvertedIndex.phraseTopK(idx, ph, 10)),
      "batch phrase diverged from per-query phraseTopK")
    // the all-unindexed phrase returns no rows, not a dead batch
    assert(!got.exists(_._1 == 3L))
    // the filtered twin equals per-query phraseTopKAmong
    val allowed = docs.filter($"doc_id" % 2 === 0).select($"doc_id")
    val gotA = batchRows(
      InvertedIndex.phraseTopKByQueryAmong(idx, queries, 10, allowed))
    assert(gotA.nonEmpty && gotA == perQuery(ph =>
      InvertedIndex.phraseTopKAmong(idx, ph, 10, allowed)),
      "filtered batch phrase diverged from per-query phraseTopKAmong")
    // slot contract: a gap in the slot sequence refuses loudly (a
    // silently-reindexed phrase would match a DIFFERENT adjacency)
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseTopKByQuery(idx,
        Seq((0L, 0, "big"), (0L, 2, "cat")).toDF("query_id", "slot", "term"),
        5).collect()
    }
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseTopKByQuery(InvertedIndex.build(docs), queries, 5)
    }
  }

  test("phraseSnippetsByQuery: batch snippets equal per-query phraseSnippets; Among twin") {
    val docs = Seq(
      (1L, "big cat sat"), (2L, "big cat big cat big"), (3L, "cat big"),
      (4L, "big  cat"), (5L, "x x x"), (6L, "big")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, withPositions = true)
    val phrases = Seq(0L -> Seq("big", "cat"), 1L -> Seq("x", "x"),
      2L -> Seq("cat", "sat"))
    val queries = (phrases.flatMap { case (qid, ph) =>
      ph.zipWithIndex.map { case (t, s) => (qid, s, t) }
    } ++ Seq((3L, 0, "absent"))).toDF("query_id", "slot", "term")
    def sorted(rows: Seq[(Long, Long, Long, Long, String)]) =
      rows.sortBy(t => (t._1, -t._3, t._2))
    def batchRows(df: org.apache.spark.sql.DataFrame) = sorted(df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq)
    def perQuery(f: Seq[String] => org.apache.spark.sql.DataFrame) =
      sorted(phrases.flatMap { case (qid, ph) =>
        f(ph).collect().map(r => (qid, r.getLong(0), r.getLong(1),
          r.getLong(2), r.getString(3))).toSeq
      })
    val got = batchRows(InvertedIndex.phraseSnippetsByQuery(
      idx, docs, queries, k = 10, context = 1))
    assert(got.nonEmpty && got == perQuery(ph =>
      InvertedIndex.phraseSnippets(idx, docs, ph, 10, context = 1)),
      "batch snippets diverged from per-query phraseSnippets")
    assert(!got.exists(_._1 == 3L)) // dead phrase: no snippet rows
    val allowed = docs.filter($"doc_id" % 2 === 0).select($"doc_id")
    val gotA = batchRows(InvertedIndex.phraseSnippetsByQueryAmong(
      idx, docs, queries, k = 10, allowed, context = 1))
    assert(gotA.nonEmpty && gotA == perQuery(ph =>
      InvertedIndex.phraseSnippetsAmong(idx, docs, ph, 10, allowed,
        context = 1)),
      "filtered batch snippets diverged from phraseSnippetsAmong")
  }

  test("proximityTopKByQuery: batch ranking equals per-query proximityTopK; Among twin; contracts") {
    val docs = Seq(
      (1L, "table a key"), (2L, "key b b table"),
      (3L, "table x x x x x key"), (4L, "key table key table"),
      (5L, "merge row table")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, withPositions = true)
    // 2- and 3-term queries in ONE batch: the per-query slice over the
    // shared running-max columns is exactly what this exercises (slots
    // past a query's own term count stay null and must not veto)
    val sets = Seq(0L -> Seq("table", "key"), 1L -> Seq("b", "key", "table"),
      2L -> Seq("merge", "row"))
    val queries = (sets.flatMap { case (qid, ts) => ts.map((qid, _)) } ++
      Seq((3L, "absent"))).toDF("query_id", "term")
    def sorted(rows: Seq[(Long, Long, Long)]) =
      rows.sortBy(t => (t._1, -t._3, t._2))
    def batchRows(df: org.apache.spark.sql.DataFrame) = sorted(df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    def perQuery(f: Seq[String] => org.apache.spark.sql.DataFrame) =
      sorted(sets.flatMap { case (qid, ts) =>
        f(ts).collect().map(r => (qid, r.getLong(0), r.getLong(1))).toSeq
      })
    val got = batchRows(
      InvertedIndex.proximityTopKByQuery(idx, queries, window = 4, k = 10))
    assert(got.nonEmpty && got == perQuery(ts =>
      InvertedIndex.proximityTopK(idx, ts, window = 4, k = 10)),
      "batch proximity diverged from per-query proximityTopK")
    assert(!got.exists(_._1 == 3L)) // unindexed query drops, batch lives
    val allowed = docs.filter($"doc_id" % 2 === 0).select($"doc_id")
    val gotA = batchRows(InvertedIndex.proximityTopKByQueryAmong(
      idx, queries, window = 4, k = 10, allowed))
    assert(gotA.nonEmpty && gotA == perQuery(ts =>
      InvertedIndex.proximityTopKAmong(idx, ts, window = 4, k = 10, allowed)),
      "filtered batch proximity diverged from per-query proximityTopKAmong")
    // contracts refuse loudly, naming the offending query
    intercept[IllegalArgumentException] {
      InvertedIndex.proximityTopKByQuery(idx,
        Seq((0L, "key"), (0L, "key")).toDF("query_id", "term"), 4, 5)
    }
    intercept[IllegalArgumentException] {
      InvertedIndex.proximityTopKByQuery(idx, queries, window = 2, k = 5)
    }
  }

  test("stats and facetCounts: health report rollups, candidate-set facets") {
    val docs = Seq((1L, "a a b", "s1"), (2L, "b c", "s1"), (3L, "c", "s2"))
      .toDF("doc_id", "text", "source")
    val idx = InvertedIndex.build(docs)
    val st = InvertedIndex.stats(idx).collect()(0)
    // n=3, sum_dl=6, vocab {a,b,c}, postings: (1,a)(1,b)(2,b)(2,c)(3,c)=5
    // dfs: a=1, b=2, c=2 -> max 2, median 2
    assert(st.getLong(0) == 3L && st.getLong(1) == 6L)
    assert(st.getLong(2) == 2000000L) // avgdl 2.0 quantized
    assert(st.getLong(3) == 3L && st.getLong(4) == 5L)
    assert(st.getLong(5) == 2L && st.getLong(6) == 2000000L)
    // facet: query {a, c} -> candidates {1, 2, 3}; by source s1=2, s2=1
    val f = InvertedIndex.facetCounts(idx, docs, Seq("a", "c"), "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(f == Seq("s1" -> 2L, "s2" -> 1L))
    // query {a} -> only doc 1
    val f2 = InvertedIndex.facetCounts(idx, docs, Seq("a"), "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(f2 == Seq("s1" -> 1L))
    // filtered facets (r15): allowed = all reduces to the unfiltered
    // counts bit-for-bit; a real filter counts ONLY allowed candidates
    // (the tenant's sidebar must not disclose other tenants' volumes)
    def fc(allowed: org.apache.spark.sql.DataFrame) =
      InvertedIndex.facetCountsAmong(idx, docs, Seq("a", "c"), "source",
        allowed).collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(fc(docs.select($"doc_id")) == f)
    // allowed {2, 3}: candidates {2, 3} -> s1=1, s2=1
    assert(fc(docs.filter($"doc_id" >= 2).select($"doc_id")) ==
      Seq("s1" -> 1L, "s2" -> 1L))
  }

  test("qlTopK: Dirichlet query likelihood matches a direct replay; artifact parity") {
    val rows = Seq((1L, "spark table scan"), (2L, "table table join"),
      (3L, "spark"), (4L, "merge join x"))
    val docs = rows.toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    val mu = 10.0
    val out = InvertedIndex.qlTopK(idx, Seq("table", "spark"), 10, mu)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // direct per-doc score: sum over BOTH query terms of
    // ln((tf + mu*p(t|C)) / (dl + mu)); candidates = docs matching >= 1
    val toks = rows.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val sdl = toks.values.map(_.length).sum.toDouble
    def pc(t: String) = toks.values.map(_.count(_ == t)).sum / sdl
    def direct(id: Long): Double = Seq("table", "spark").map { t =>
      val tf = toks(id).count(_ == t).toDouble
      math.log((tf + mu * pc(t)) / (toks(id).length + mu))
    }.sum
    val expectedIds = Seq(1L, 2L, 3L)
      .sortBy(id => (-direct(id), id))
    assert(out.map(_._1) == expectedIds)
    out.foreach { case (id, q) =>
      assert(math.abs(q / 1e6 - direct(id)) < 1e-6,
        s"doc $id quantized score $q far from direct ${direct(id)}")
    }
    // persisting must not change a score (the bm25 artifact contract)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-ql").toString
    InvertedIndex.save(idx, dir)
    val loaded = InvertedIndex.load(spark, dir)
    val again = InvertedIndex.qlTopK(loaded, Seq("table", "spark"), 10, mu)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(again == out)
    // an absent query term is dropped; ALL absent refuses loudly
    assert(InvertedIndex.qlTopK(idx, Seq("table", "zzz"), 10, mu)
      .collect().nonEmpty)
    intercept[IllegalArgumentException] {
      InvertedIndex.qlTopK(idx, Seq("zzz", "qqq"), 10, mu)
    }
    // BAG semantics, like bm25Scores: a repeated term weighs twice
    val bag = InvertedIndex
      .qlTopK(idx, Seq("table", "table", "spark"), 10, mu)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def directBag(id: Long): Double = Seq("table", "table", "spark").map {
      t =>
        val tf = toks(id).count(_ == t).toDouble
        math.log((tf + mu * pc(t)) / (toks(id).length + mu))
    }.sum
    bag.foreach { case (id, q) =>
      assert(math.abs(q / 1e6 - directBag(id)) < 1e-6,
        s"doc $id bag score $q far from direct ${directBag(id)}")
    }
  }

  test("stats on an empty-vocabulary corpus reports zeros, never NULLs") {
    val empty = InvertedIndex.stats(
      InvertedIndex.build(Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")))
      .collect()(0)
    assert(empty.getLong(0) == 2L && empty.getLong(1) == 0L) // docs, sum_dl
    assert(empty.getLong(3) == 0L && empty.getLong(4) == 0L) // terms, postings
    assert(empty.getLong(5) == 0L && empty.getLong(6) == 0L) // max/p50 df
  }

  test("suggestTerms: edit-1 neighbors ranked by (dist, df desc, term)") {
    // vocabulary with planted neighbors: "cat" (df 3), "cart" (df 1),
    // "bat" (df 2), "dog" (df 1) — query "cat" matches itself at 0,
    // then bat/cart at 1 ranked by df; "zat" matches cat then bat
    val docs = Seq((1L, "cat bat dog"), (2L, "cat bat cart"), (3L, "cat"))
      .toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    val out = InvertedIndex.suggestTerms(idx, Seq("cat", "zat", "qqq"), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    assert(out == Seq(
      ("cat", "cat", 0L, 3L, 1), ("cat", "bat", 1L, 2L, 2),
      ("cat", "cart", 1L, 1L, 3),
      ("zat", "cat", 1L, 3L, 1), ("zat", "bat", 1L, 2L, 2)))
    // no edit-1 neighbor -> the query simply yields no rows
    assert(!out.exists(_._1 == "qqq"))
    // blocking completeness vs the naive scan on this vocabulary
    val vocab = idx.termDf.collect().map(_.getString(0))
    val naive = for {
      q <- Seq("cat", "zat", "qqq"); t <- vocab
      if levenshteinDist(q, t) <= 1
    } yield (q, t)
    assert(out.map(r => (r._1, r._2)).toSet == naive.toSet)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("proximityTopK: min-window hits, ordering, and the refusal contracts") {
    val docs = Seq(
      (1L, "big x x x cat"),      // span 4 < 5: one window
      (2L, "big x x x x cat"),    // span 5: no window at w=5
      (3L, "big cat big cat"),    // closes at 1, 2, 3: three windows
      (4L, "cat y big"),          // order-free: span 2, one window
      (5L, "big big big")         // cat never arrives: none
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, withPositions = true)
    val out = InvertedIndex
      .proximityTopK(idx, Seq("big", "cat"), window = 5, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out == Seq(3L -> 3L, 1L -> 1L, 4L -> 1L))
    // window width exactly the span boundary: "big x x x cat" needs >= 5,
    // docs 3 (span 1) and 4 (span 2) still qualify at 4
    assert(InvertedIndex.proximityTopK(idx, Seq("big", "cat"), 4, 10)
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    intercept[IllegalArgumentException] { // bag proximity refused
      InvertedIndex.proximityTopK(idx, Seq("big", "big"), 5, 10)
    }
    intercept[IllegalArgumentException] { // window cannot hold the terms
      InvertedIndex.proximityTopK(idx, Seq("big", "cat"), 1, 10)
    }
    intercept[IllegalArgumentException] { // positional index required
      InvertedIndex.proximityTopK(InvertedIndex.build(docs),
        Seq("big", "cat"), 5, 10)
    }
  }

  test("phraseSnippets: first occurrence, clamped window, filtered coordinates") {
    val docs = Seq(
      (1L, "a b c big cat d e f big cat"), // first occ at 3; window 0..8
      (2L, "big cat x"),                   // occ at 0: clamp left
      (3L, "q r s t u big cat"),           // occ at 5: truncate right
      (4L, "big  cat tail")                // doubled space: positions filtered
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, withPositions = true)
    val out = InvertedIndex
      .phraseSnippets(idx, docs, Seq("big", "cat"), k = 10, context = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 3L, "a b c big cat d e f")))
    assert(out(2L) == ((1L, 0L, "big cat x")))
    assert(out(3L) == ((1L, 5L, "s t u big cat")))
    assert(out(4L) == ((1L, 0L, "big cat tail")))
    // ranking: doc 1 (2 occurrences) leads
    val ranked = InvertedIndex
      .phraseSnippets(idx, docs, Seq("big", "cat"), k = 2, context = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(ranked == Seq(1L, 2L))
    // the refusal contracts ride the shared anchor path
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseSnippets(InvertedIndex.build(docs), docs,
        Seq("big", "cat"), 10)
    }
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseSnippets(idx, docs, Seq.empty, 10)
    }
    // filtered snippets (r15): allowed = all reduces to the unfiltered
    // serve bit-for-bit; a real filter equals snippets over an index
    // built on the allowed corpus alone (occurrence counts and slices
    // are per-doc facts — pre-filter semantics, never a post-cut)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(rows(InvertedIndex.phraseSnippetsAmong(idx, docs,
        Seq("big", "cat"), 10, docs.select($"doc_id"), context = 3)) ==
      rows(InvertedIndex.phraseSnippets(idx, docs, Seq("big", "cat"), 10,
        context = 3)))
    val odd = docs.filter($"doc_id" % 2 === 1)
    assert(rows(InvertedIndex.phraseSnippetsAmong(idx, docs,
        Seq("big", "cat"), 10, odd.select($"doc_id"), context = 3)) ==
      rows(InvertedIndex.phraseSnippets(
        InvertedIndex.build(odd, withPositions = true), odd,
        Seq("big", "cat"), 10, context = 3)))
  }

  test("save/load probe is bit-identical to the in-memory probe") {
    InvertedIndex.save(built, idxDir)
    val loaded = InvertedIndex.load(spark, idxDir)
    assert(loaded.n == built.n && loaded.avgdl == built.avgdl)
    val terms = built.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    def probe(i: InvertedIndex.LexIndex) =
      InvertedIndex.bm25TopK(i, terms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probe(loaded) == probe(built))
  }

  test("probe prunes posting partitions to the query terms' buckets") {
    InvertedIndex.save(built, idxDir)
    val loaded = InvertedIndex.load(spark, idxDir)
    val terms = Seq("spark") // one term => at most one bucket scanned
    val plan = InvertedIndex.bm25TopK(loaded, terms, 5)
      .queryExecution.executedPlan.toString
    // the bucket filter must reach the scan as a partition filter, not a
    // post-scan predicate over all 64 buckets
    assert(plan.contains("PartitionFilters") &&
      plan.contains("bucket"), s"no partition pruning:\n$plan")
    // the phrase probe rides the same pruning (positional artifact)
    val posDir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-prune-pos").toString
    InvertedIndex.save(
      InvertedIndex.build(Tables.documents(spark, sf001),
        withPositions = true), posDir)
    val posPlan = InvertedIndex
      .phraseTopK(InvertedIndex.load(spark, posDir), Seq("spark"), 5)
      .queryExecution.executedPlan.toString
    assert(posPlan.contains("PartitionFilters") &&
      posPlan.contains("bucket"), s"no phrase partition pruning:\n$posPlan")
  }

  test("append then load probes bit-identically to a rebuild over the union") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-append").toString
    val all = Tables.documents(spark, sf001)
    val first = all.filter($"doc_id" % 3 =!= 0)
    val batch = all.filter($"doc_id" % 3 === 0)
    InvertedIndex.save(InvertedIndex.build(first), dir)
    InvertedIndex.append(dir, batch)
    val appended = InvertedIndex.load(spark, dir)
    val rebuilt = InvertedIndex.build(all)
    assert(appended.n == rebuilt.n && appended.sdl == rebuilt.sdl)
    val terms = rebuilt.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    def probe(i: InvertedIndex.LexIndex) =
      InvertedIndex.bm25TopK(i, terms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probe(appended) == probe(rebuilt))
  }

  test("append into an empty directory bootstraps a fresh artifact") {
    // first-write callers need no special case: append without a prior
    // save() builds-and-saves a positionless artifact instead of
    // throwing path-not-found on the postings schema sniff
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-boot").toString + "/idx"
    val all = Tables.documents(spark, sf001)
    val first = all.filter($"doc_id" % 3 =!= 0)
    val batch = all.filter($"doc_id" % 3 === 0)
    InvertedIndex.append(dir, first) // bootstrap
    InvertedIndex.append(dir, batch) // normal delta append
    val appended = InvertedIndex.load(spark, dir)
    val rebuilt = InvertedIndex.build(all)
    assert(appended.n == rebuilt.n && appended.sdl == rebuilt.sdl)
    val terms = rebuilt.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(probeRows(appended, terms) == probeRows(rebuilt, terms))
  }

  private def probeRows(i: InvertedIndex.LexIndex, terms: Seq[String]) =
    InvertedIndex.bm25TopK(i, terms, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("delete: tombstoned probe is bit-identical to a rebuild over survivors") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-del").toString
    val all = Tables.documents(spark, sf001)
    InvertedIndex.save(InvertedIndex.build(all), dir)
    val deadIds = all.filter($"doc_id" % 7 === 3)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    InvertedIndex.delete(spark, dir, deadIds)
    val adjusted = InvertedIndex.load(spark, dir)
    val rebuilt = InvertedIndex.build(all.filter($"doc_id" % 7 =!= 3))
    // stats relation-for-relation
    assert(adjusted.n == rebuilt.n && adjusted.sdl == rebuilt.sdl)
    val aDf = adjusted.termDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rDf = rebuilt.termDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(aDf == rDf)
    val terms = rebuilt.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(probeRows(adjusted, terms) == probeRows(rebuilt, terms))
    // deleted docs never surface even for their own strongest terms
    val deadSet = deadIds.toSet
    val anyTerms = adjusted.termDf.orderBy($"df".desc, $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(probeRows(adjusted, anyTerms).forall(p => !deadSet.contains(p._1)))
  }

  test("delete: idempotent, unknown ids are no-ops, sole-doc terms vanish") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta beta delta"),
      (3L, "zeta zeta zeta unique0")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-del2").toString
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    InvertedIndex.delete(spark, dir, Seq(3L, 99L)) // 99 never existed
    InvertedIndex.delete(spark, dir, Seq(3L))      // double-delete
    val adjusted = InvertedIndex.load(spark, dir)
    assert(adjusted.n == 2L)
    // zeta/unique0 existed only in doc 3: df must drop to zero and OUT
    val terms = adjusted.termDf.collect().map(_.getString(0)).toSet
    assert(!terms.contains("zeta") && !terms.contains("unique0"))
    assert(InvertedIndex.bm25TopK(adjusted, Seq("unique0"), 3).collect()
      .isEmpty)
  }

  test("compact folds tombstones: bit-equal probes, tombstones gone, append still works") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-compact").toString
    val all = Tables.documents(spark, sf001)
    InvertedIndex.save(InvertedIndex.build(all), dir)
    InvertedIndex.delete(all.filter($"doc_id" % 7 === 3).select($"doc_id"), dir)
    InvertedIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    val compacted = InvertedIndex.load(spark, dir)
    val rebuilt = InvertedIndex.build(all.filter($"doc_id" % 7 =!= 3))
    assert(compacted.n == rebuilt.n && compacted.sdl == rebuilt.sdl)
    val terms = rebuilt.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(probeRows(compacted, terms) == probeRows(rebuilt, terms))
    // compact on a tombstone-free artifact is a no-op, not an error
    InvertedIndex.compact(spark, dir)
    // the compacted artifact keeps the append contract: delete+compact+
    // append ≡ build over (survivors + batch)
    val batch = Seq((900001L, "alpha compacted appendix")).toDF("doc_id", "text")
    InvertedIndex.append(dir, batch)
    val appended = InvertedIndex.load(spark, dir)
    val target = InvertedIndex.build(
      all.filter($"doc_id" % 7 =!= 3).select($"doc_id", $"text")
        .unionByName(batch))
    assert(appended.n == target.n && appended.sdl == target.sdl)
    assert(probeRows(appended, terms) == probeRows(target, terms))
  }

  test("lifecycle is filesystem-portable: delete/load/compact through a file: URI") {
    // A `file:` scheme URI is NOT a valid java.io.File path — the raw-path
    // existence check the lifecycle used to make would return false here,
    // silently skipping tombstones and serving deleted documents. Routing
    // through Path.getFileSystem makes the same code work for local, HDFS,
    // and S3 artifact dirs; this test pins that the Hadoop-FS path is the
    // one actually taken.
    val raw = java.nio.file.Files
      .createTempDirectory("graft-lexidx-fsuri").toString
    val dir = "file:" + raw
    val all = Tables.documents(spark, sf001)
    InvertedIndex.save(InvertedIndex.build(all), dir)
    InvertedIndex.delete(all.filter($"doc_id" % 7 === 3).select($"doc_id"), dir)
    val adjusted = InvertedIndex.load(spark, dir)
    val rebuilt = InvertedIndex.build(all.filter($"doc_id" % 7 =!= 3))
    assert(adjusted.n == rebuilt.n && adjusted.sdl == rebuilt.sdl)
    val terms = rebuilt.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(probeRows(adjusted, terms) == probeRows(rebuilt, terms))
    // compact through the URI: tombstones folded and removed on the
    // resolved filesystem (checked via Hadoop FS, not java.io.File)
    InvertedIndex.compact(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir-compact-staging")))
    val compacted = InvertedIndex.load(spark, dir)
    assert(compacted.n == rebuilt.n &&
      probeRows(compacted, terms) == probeRows(rebuilt, terms))
  }

  test("ranking semantics: a term unique to one doc ranks that doc first") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta beta delta"),
      (3L, "zeta zeta zeta unique0")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    val top = InvertedIndex.bm25TopK(idx, Seq("unique0"), 3).collect()
    assert(top.length == 1 && top(0).getLong(0) == 3L)
    // a term present everywhere still scores > 0 under the +1 idf floor
    val all = InvertedIndex.bm25TopK(idx, Seq("alpha"), 3).collect()
    assert(all.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  private def runBoth(idx: InvertedIndex.LexIndex, terms: Seq[String],
      k: Int): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    (rows(InvertedIndex.bm25TopK(idx, terms, k)),
      rows(InvertedIndex.bm25TopKPruned(idx, terms, k)))
  }

  test("suggestTerms serves from the persisted dictionary across the lifecycle") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-suggest").toString
    val docs = Seq(
      (1L, "spark scan table"),
      (2L, "spork merge"),
      (3L, "spark merge join")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    val loaded = InvertedIndex.load(spark, dir)
    assert(loaded.suggestKeys.isDefined, "save must persist the dictionary")
    val served = InvertedIndex.suggestTerms(loaded, Seq("spark"), 3)
    // artifact-served ≡ the per-call derivation (build-only index)
    assert(rows(served) ==
      rows(InvertedIndex.suggestTerms(InvertedIndex.build(docs),
        Seq("spark"), 3)))
    // the probe plan reads the persisted relation, no vocabulary explode
    // and (r13) no vocabulary-wide termDf join: df rides the dictionary
    val servedPlan = served.queryExecution.executedPlan.toString
    assert(servedPlan.contains("suggest"),
      "artifact probe must scan the persisted dictionary")
    assert(!servedPlan.contains("termdf"),
      "df path must not join the vocabulary relation")
    assert(rows(served).map(_._2).contains("spork")) // lev 1 neighbor
    // append: the delta vocabulary becomes suggestable from the artifact
    InvertedIndex.append(dir, Seq((4L, "spars rows")).toDF("doc_id", "text"))
    val appended = InvertedIndex.load(spark, dir)
    assert(rows(InvertedIndex.suggestTerms(appended, Seq("spark"), 3))
      .map(_._2).contains("spars"))
    // delete the sole holder of "spork": the suggestion disappears even
    // though its dictionary keys are still on disk (termDf join drops it)
    InvertedIndex.delete(spark, dir, Seq(2L))
    val tombed = InvertedIndex.load(spark, dir)
    // materialize BEFORE compact rewrites the files this plan reads
    val tombedRows = rows(InvertedIndex.suggestTerms(tombed, Seq("spark"), 3))
    assert(!tombedRows.map(_._2).contains("spork"))
    // compact rewrites the dictionary from the surviving vocabulary
    InvertedIndex.compact(spark, dir)
    val compacted = InvertedIndex.load(spark, dir)
    assert(rows(InvertedIndex.suggestTerms(compacted, Seq("spark"), 3)) ==
      tombedRows)
    assert(spark.read.parquet(s"$dir/suggest")
      .filter($"term" === "spork").count() == 0,
      "compact must shed dead terms' dictionary keys")
  }

  test("suggestTermsAmong: tenant-local vocabulary and dfs; allowed=all reduces exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-suggest-among").toString
    // "spork" lives ONLY in doc 2 — under an odd-docs filter it must
    // never be suggested (vocabulary is a disclosure), and "spark"'s
    // df must count the tenant's docs alone
    val docs = Seq(
      (1L, "spark scan table"),
      (2L, "spork merge"),
      (3L, "spark merge join")).toDF("doc_id", "text")
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    val idx = InvertedIndex.load(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    // allowed = everything: re-derived dfs ARE the corpus dfs
    assert(rows(InvertedIndex.suggestTermsAmong(idx, Seq("spark"), 3,
        docs.select($"doc_id"))) ==
      rows(InvertedIndex.suggestTerms(idx, Seq("spark"), 3)))
    val odd = rows(InvertedIndex.suggestTermsAmong(idx, Seq("spark"), 3,
      docs.filter($"doc_id" % 2 === 1).select($"doc_id")))
    assert(!odd.map(_._2).contains("spork"),
      "a term held only by disallowed docs leaked into suggestions")
    assert(odd.exists(t => t._2 == "spark" && t._4 == 2L),
      s"tenant-local df wrong: $odd")
    // a query with no allowed-vocabulary neighbors returns no rows
    assert(InvertedIndex.suggestTermsAmong(idx, Seq("spork"), 3,
      docs.filter($"doc_id" % 2 === 1).select($"doc_id"))
      .filter($"term" === "spork").count() == 0)
    // the empty-allowed edge, pinned explicitly (r15 verdict item 7): a
    // tenant whose allowed set intersects NO candidate postings gets an
    // EMPTY suggestion relation — the inner join against the re-derived
    // allowed dfs, never a corpus-df fallback (which would disclose
    // other tenants' vocabulary). Schema stays the serve contract's.
    val empty = InvertedIndex.suggestTermsAmong(idx, Seq("spark"), 3,
      Seq(999L).toDF("doc_id"))
    assert(empty.count() == 0,
      "an allowed set holding no candidate postings must suggest nothing")
    assert(empty.columns.toSeq ==
      Seq("query", "term", "dist", "df", "rn"))
    // and an allowed RELATION that is itself empty behaves the same
    assert(InvertedIndex.suggestTermsAmong(idx, Seq("spark"), 3,
      docs.filter($"doc_id" < 0).select($"doc_id")).count() == 0)
  }

  test("Among family keeps the allowed ids' native type: string-keyed filtered serving works") {
    // the delete-type lesson on the serving side: the former
    // cast-to-long made every filtered verb on a string-keyed index a
    // silent zero-result filter
    val docs = Seq(("a1", "alpha beta"), ("a2", "beta gamma"),
      ("a3", "alpha alpha"), ("a4", "gamma")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    val allowed = Seq("a1", "a3").toDF("doc_id")
    val got = InvertedIndex.bm25TopKAmong(idx, Seq("alpha"), 10, allowed)
      .collect().map(_.getString(0)).toSeq
    assert(got.toSet == Set("a1", "a3"),
      s"string-keyed filtered serve broken: $got")
    // int-typed allowed against the long-keyed default corpus still
    // coerces in the join (the numeric-width case the old cast served)
    val docsL = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      .toDF("doc_id", "text")
    val idxL = InvertedIndex.build(docsL)
    val allowedInt = Seq(1, 3).toDF("doc_id") // IntegerType
    assert(InvertedIndex.bm25TopKAmong(idxL, Seq("alpha"), 10, allowedInt)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("delete keeps the artifact's doc-id type; lossy casts fail loudly") {
    // the deleteFromAnnIndex lesson (r15) applied to the lexical twin:
    // a string-keyed index tombstoned through the old cast-to-long
    // produced all-null tombstones and deleted NOTHING
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-deltype").toString
    val docs = Seq(("d1", "alpha beta"), ("d2", "beta gamma"),
      ("d3", "alpha")).toDF("doc_id", "text")
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    InvertedIndex.delete(Seq("d2").toDF("doc_id"), dir)
    assert(spark.read.parquet(s"$dir/tombstones")
      .schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val idx = InvertedIndex.load(spark, dir)
    assert(idx.n == 2, s"takedown no-opped: n=${idx.n}")
    assert(idx.postings.filter($"doc_id" === "d2").count() == 0)
    // a long-keyed artifact refuses an id its type cannot represent
    val dirL = java.nio.file.Files
      .createTempDirectory("graft-lexidx-deltype-l").toString
    InvertedIndex.save(InvertedIndex.build(
      Seq((1L, "alpha beta")).toDF("doc_id", "text")), dirL)
    val e = intercept[Exception] {
      InvertedIndex.delete(Seq("not-a-long").toDF("doc_id"), dirL)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage))
      .mkString(" | ")
    assert(msgs.contains("does not cast"), s"got: $msgs")
  }

  test("qlTopKByQuery: batch ranking equals per-query qlTopK; Among twin; dead queries drop") {
    val docs = Seq(
      (1L, "spark table scan"), (2L, "table merge join"),
      (3L, "spark join hash"), (4L, "scan scan scan table"),
      (5L, "merge table spark"), (6L, "hash probe build"))
      .toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    val q0 = Seq("table", "scan") // two live terms
    val q1 = Seq("spark", "spark", "hash") // repeated term: bag weight 2
    val queries = (q0.map((0L, _)) ++ q1.map((1L, _)) ++
      Seq((2L, "zzz_unindexed"))).toDF("query_id", "term")
    def sorted(rows: Seq[(Long, Long, Long)]) =
      rows.sortBy(t => (t._1, -t._3, t._2))
    def batchRows(df: org.apache.spark.sql.DataFrame) = sorted(df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    def perQuery(f: Seq[String] => org.apache.spark.sql.DataFrame) =
      sorted(Seq(0L -> q0, 1L -> q1).flatMap { case (qid, ts) =>
        f(ts).collect().map(r => (qid, r.getLong(0), r.getLong(1))).toSeq
      })
    val got = batchRows(InvertedIndex.qlTopKByQuery(idx, queries, 3))
    assert(got.nonEmpty &&
      got == perQuery(ts => InvertedIndex.qlTopK(idx, ts, 3)),
      "batch QL diverged from per-query qlTopK")
    // the all-unindexed query returns no rows instead of killing the
    // batch (qlTopK's loud refusal is the right contract for ONE query,
    // not for one bad query in a thousand)
    assert(!got.exists(_._1 == 2L))
    // the filtered twin equals per-query qlTopKAmong
    val allowed = docs.filter($"doc_id" % 2 === 1).select($"doc_id")
    val gotA = batchRows(
      InvertedIndex.qlTopKByQueryAmong(idx, queries, 3, allowed))
    assert(gotA.nonEmpty &&
      gotA == perQuery(ts => InvertedIndex.qlTopKAmong(idx, ts, 3, allowed)),
      "filtered batch QL diverged from per-query qlTopKAmong")
    // the all-dead-queries empty result carries the ARTIFACT's native
    // doc-id type (r15 ADVICE: a hardcoded LongType gave a string-keyed
    // index a different empty schema, breaking downstream unions)
    val idxS = InvertedIndex.build(
      Seq(("d1", "alpha beta"), ("d2", "beta")).toDF("doc_id", "text"))
    val deadS = InvertedIndex.qlTopKByQuery(idxS,
      Seq((0L, "zzz_unindexed")).toDF("query_id", "term"), 3)
    assert(deadS.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val liveS = InvertedIndex.qlTopKByQuery(idxS,
      Seq((0L, "alpha")).toDF("query_id", "term"), 3)
    assert(deadS.unionByName(liveS).count() == 1L,
      "empty and non-empty batch results must union")
  }

  test("de-synced meta/suggest lockstep detected at load: probe falls back to the termDf route") {
    // the r14 verdict's comment-only invariant, now a verified check:
    // save/append keep one suggestmeta ledger row per suggest delta, and
    // load() compares it against the meta row count instead of trusting
    // the write sites
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-desync").toString
    val docs = Seq(
      (1L, "spark scan table"),
      (2L, "spork merge"),
      (3L, "spark merge join")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    InvertedIndex.append(dir, Seq((4L, "spars rows")).toDF("doc_id", "text"))
    // lockstep INTACT (ledger == meta == 2): the dictionary serves with
    // merged dfs, still no vocabulary-wide termdf join in the plan
    val intact = InvertedIndex.suggestTerms(
      InvertedIndex.load(spark, dir), Seq("spark"), 3)
    val intactRows = rows(intact)
    assert(!intact.queryExecution.executedPlan.toString.contains("termdf"),
      "verified-lockstep dictionary must not route df through termdf")
    // a FUTURE writer breaks the lockstep: a meta row lands with no
    // suggest delta (simulated as a raw parquet append). Pre-r15 this
    // flipped the merge decision silently; now load detects the mismatch.
    Seq((0L, 0L)).toDF("n", "sdl").write.mode("append").parquet(s"$dir/meta")
    val desynced = InvertedIndex.load(spark, dir)
    val served = InvertedIndex.suggestTerms(desynced, Seq("spark"), 3)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("suggest"),
      "fallback still prunes the persisted key dictionary")
    assert(plan.contains("termdf"),
      "de-synced dictionary must re-derive df through the termDf join")
    // dfs and ranking equal the per-call derivation (the always-correct
    // route) — and the intact serve agreed with it too
    val derived = rows(InvertedIndex.suggestTerms(
      desynced.copy(suggestKeys = None), Seq("spark"), 3))
    assert(rows(served) == derived && intactRows == derived)
  }

  test("compact rewrites the suggestmeta ledger: save -> append -> delete -> compact keeps the raw-serve fast path") {
    // the r15 ADVICE find: compact()'s rename list omitted the staged
    // one-row ledger, so a compacted ever-appended artifact kept its
    // pre-compact delta count beside the fresh one-row meta — load()'s
    // lockstep check then tripped FOREVER on a consistent artifact and
    // suggest df permanently fell back to the termDf join, contradicting
    // the documented rewrites-back-to-one-of-each heal
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-compact-ledger").toString
    val docs = Seq(
      (1L, "spark scan table"),
      (2L, "spork merge"),
      (3L, "spark merge join")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    InvertedIndex.append(dir, Seq((4L, "spars rows")).toDF("doc_id", "text"))
    InvertedIndex.delete(spark, dir, Seq(4L))
    InvertedIndex.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/suggestmeta").count() == 1L,
      "compact must swap the staged one-row ledger in with the dictionary")
    val compacted = InvertedIndex.load(spark, dir)
    val served = InvertedIndex.suggestTerms(compacted, Seq("spark"), 3)
    assert(!served.queryExecution.executedPlan.toString.contains("termdf"),
      "post-compact artifact must serve the raw fast path, not the fallback")
    assert(rows(served) == rows(InvertedIndex.suggestTerms(
      compacted.copy(suggestKeys = None), Seq("spark"), 3)))
    // a PRE-ledger artifact (no suggestmeta on disk) gains its ledger at
    // compact — the install the heal always promised
    val (fs, root) = InvertedIndex.fsFor(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(root, "suggestmeta"), true)
    InvertedIndex.delete(spark, dir, Seq(2L))
    InvertedIndex.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/suggestmeta").count() == 1L,
      "compact must install the ledger on a pre-ledger artifact")
    val healed = InvertedIndex.load(spark, dir)
    assert(!InvertedIndex.suggestTerms(healed, Seq("spark"), 3)
      .queryExecution.executedPlan.toString.contains("termdf"))
  }

  test("legacy df-less dictionary: coarse-grid pruning, layout-preserving append") {
    // simulate an r12 artifact: df-less dictionary rows under the
    // POSTING bucket grid. The probe must resolve the artifact's own
    // modulus (pruning under the fine grid would read the wrong
    // partitions and silently miss suggestions) and route df through
    // the termDf join; append must keep the legacy layout instead of
    // scattering keys across two grids.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-suggest-legacy").toString
    val docs = Seq(
      (1L, "spark scan table"),
      (2L, "spork merge"),
      (3L, "spark merge join")).toDF("doc_id", "text")
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    val legacyRows = spark.read.parquet(s"$dir/suggest")
      .select($"term", $"__qk",
        pmod($"__qk", lit(InvertedIndex.Buckets.toLong)).cast("int")
          .as("bucket"))
      .collect()
    val legacySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__qk",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType)))
    spark.createDataFrame(java.util.Arrays.asList(legacyRows: _*),
        legacySchema)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/suggest")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    val want = rows(InvertedIndex.suggestTerms(InvertedIndex.build(docs),
      Seq("spark"), 3))
    val legacy = InvertedIndex.load(spark, dir)
    assert(legacy.suggestBucketCount == InvertedIndex.Buckets,
      "df-less dictionary must resolve the coarse posting grid")
    assert(rows(InvertedIndex.suggestTerms(legacy, Seq("spark"), 3)) == want)
    // append keeps the legacy layout: no df column, coarse buckets only
    InvertedIndex.append(dir, Seq((4L, "spars rows")).toDF("doc_id", "text"))
    val appended = spark.read.parquet(s"$dir/suggest")
    assert(!appended.columns.contains("df"))
    assert(appended.agg(max($"bucket")).head().getInt(0)
      < InvertedIndex.Buckets)
    assert(rows(InvertedIndex.suggestTerms(InvertedIndex.load(spark, dir),
      Seq("spark"), 3)).map(_._2).contains("spars"))
  }

  test("bm25TopKPruned: lossless across query shapes on the real corpus") {
    val idx = built
    val byDf = idx.termDf.orderBy($"df", $"term").collect()
      .map(_.getString(0))
    val rare2 = byDf.take(2).toSeq
    val stop1 = byDf.last
    // the pruning-relevant shape: stop-term + rare terms
    val (a1, b1) = runBoth(idx, stop1 +: rare2, 10)
    assert(a1 == b1, s"stop+rare: $a1 vs $b1")
    // all-stop query (no useful prefix — must still be exact)
    val stops = byDf.takeRight(3).toSeq
    val (a2, b2) = runBoth(idx, stops, 10)
    assert(a2 == b2, s"all-stop: $a2 vs $b2")
    // single term; repeated (bag) term; k exceeding the match count
    val (a3, b3) = runBoth(idx, Seq(rare2.head), 10)
    assert(a3 == b3)
    val (a4, b4) = runBoth(idx, Seq(stop1, stop1, rare2.head), 10)
    assert(a4 == b4, s"bag: $a4 vs $b4")
    val (a5, b5) = runBoth(idx, rare2, 10000)
    assert(a5 == b5)
    // a term the index has never seen alongside real ones
    val (a6, b6) = runBoth(idx, Seq("nosuchterm_xyzzy", rare2.head), 5)
    assert(a6 == b6)
  }

  test("bm25TopKPruned: near-equal bounds (uncertifiable cut) stays exact") {
    // two equally-rare terms + one stop-term: the essential term's
    // threshold cannot dominate the twin term's bound, so the cut fails
    // to certify and the certified fallback must land on the unpruned
    // answer
    val docs = Seq(
      (1L, "twin1 filler filler"),
      (2L, "twin2 filler filler"),
      (3L, "twin1 twin2 filler"),
      (4L, "filler filler filler filler"),
      (5L, "filler twin1"),
      (6L, "filler twin2")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    val (a, b) = runBoth(idx, Seq("twin1", "twin2", "filler"), 4)
    assert(a == b, s"$a vs $b")
    val (a2, b2) = runBoth(idx, Seq("twin1", "twin2"), 2)
    assert(a2 == b2)
  }

  test("legacy artifact without max_tf loads; pruning stays lossless on the loose bound") {
    // simulate an artifact persisted before the max_tf statistic: strip
    // the column from termdf on disk; load must fall back to the
    // Long.MaxValue bound (valid, loose) instead of throwing — the r11
    // regression shape, but for OLD artifacts instead of new code
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-legacy").toString
    val docs = Seq(
      (1L, "hot hot cold rare1"),
      (2L, "hot cold cold"),
      (3L, "cold rare1 rare2")).toDF("doc_id", "text")
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    val stripped = spark.read.parquet(s"$dir/termdf").drop("max_tf")
      .collect()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("df",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
        java.util.Arrays.asList(stripped: _*), schema)
      .write.mode("overwrite").parquet(s"$dir/termdf")
    val legacy = InvertedIndex.load(spark, dir)
    assert(legacy.termDf.filter($"max_tf" =!= Long.MaxValue).count() == 0)
    val (a, b) = runBoth(legacy, Seq("hot", "rare1"), 3)
    assert(a == b, s"$a vs $b")
    // tombstoning a legacy artifact works too (the r11 crash path)
    InvertedIndex.delete(spark, dir, Seq(2L))
    val tombed = InvertedIndex.load(spark, dir)
    val (a2, b2) = runBoth(tombed, Seq("hot", "rare1"), 3)
    assert(a2 == b2)
    // compact re-derives the EXACT statistic from surviving postings
    InvertedIndex.compact(spark, dir)
    val compacted = InvertedIndex.load(spark, dir)
    assert(compacted.termDf.filter($"max_tf" === Long.MaxValue).count() == 0)
  }

  test("bm25TopKPrunedByQuery: batch cut equals per-query ranking everywhere") {
    val idx = built
    val byDf = idx.termDf.orderBy($"df", $"term").collect()
      .map(_.getString(0))
    val (rare, stops) = (byDf.take(3).toSeq, byDf.takeRight(2).toSeq)
    // q1/q2: stop+rare (should certify); q3: all-stop (must fall back);
    // q4: single rare term; q5: only an unindexed term (zero rows)
    val queries = Seq(
      (1L, stops.head), (1L, rare(0)),
      (2L, stops.head), (2L, rare(1)),
      (3L, stops(0)), (3L, stops(1)),
      (4L, rare(2)),
      (5L, "nosuchterm_xyzzy")).toDF("query_id", "term")
    val batch = InvertedIndex.bm25TopKPrunedByQuery(idx, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))
        .sortBy(t => (-t._2, t._1)).toSeq).toMap
    def single(terms: Seq[String]) =
      InvertedIndex.bm25TopK(idx, terms, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch(1L) == single(Seq(stops.head, rare(0))))
    assert(batch(2L) == single(Seq(stops.head, rare(1))))
    assert(batch(3L) == single(Seq(stops(0), stops(1))))
    assert(batch(4L) == single(Seq(rare(2))))
    assert(!batch.contains(5L), "unindexed-only query must return no rows")
  }

  test("batch WAND never drops a query whose advertised term has no postings") {
    // the losslessness invariant at InvertedIndex.bm25TopKPrunedByQuery's
    // okIds/badIds split, made structural: "termDf df > 0 ⇒ postings
    // nonempty" holds for every index this API builds (applyTombstones
    // filters df > 0), but a future index variant with a STALE termDf row
    // could advertise a term whose postings vanished. If that term ranks
    // essential (rare ⇒ top ub), its query produces ZERO candidates — and
    // must fall back to full scoring over its other terms, never silently
    // vanish from the result.
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry")).toDF("doc_id", "text")
    val real = InvertedIndex.build(docs)
    // poison: keep a "ghost" row in termDf (df=1, huge max_tf) whose
    // postings are GONE. The query carries ghost TWICE (bag weight 2) so
    // its ub dominates: suffix share ≈ 0.17 < PruneFlatSuffixCutoff and
    // cumulative df 1 ≤ half the total — the planner MUST route it
    // pruned with essential = {ghost}, whose candidate set is empty.
    // (A routed-direct ghost would never reach the guard under test.)
    val ghostTermDf = real.termDf.unionByName(
      Seq(("ghost", 1L, 100L)).toDF("term", "df", "max_tf"))
    val stale = real.copy(termDf = ghostTermDf)
    val queries = Seq(
      (1L, "ghost"), (1L, "ghost"), (1L, "banana"),
      (2L, "apple")).toDF("query_id", "term")
    val got = InvertedIndex.bm25TopKPrunedByQuery(stale, queries, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))
        .sortBy(t => (-t._2, t._1)).toSeq).toMap
    // query 1 must SURVIVE via the fallback: full scoring over the stale
    // index ("ghost" matches no postings; "banana" scores docs 1, 2).
    // Under the regressed candidate-keyed universe (byQuery) the empty
    // candidate set would drop query 1 entirely — this assert is the pin.
    val want1 = InvertedIndex
      .bm25Scores(stale, Seq("ghost", "ghost", "banana"))
      .orderBy($"score_q".desc, $"doc_id").limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.contains(1L), "query with a stale essential term was dropped")
    assert(got(1L) == want1, s"${got.get(1L)} vs $want1")
    assert(got(2L).map(_._1).toSet == Set(1L, 3L))
    // the single-query probe shares the batch organization — same guard
    val single = InvertedIndex.bm25TopKPruned(
        stale, Seq("ghost", "ghost", "banana"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(single == want1)
  }

  test("bm25TopKPruned: valid over a tombstoned artifact (loose max_tf)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lexidx-wand").toString
    // the doc holding the global max tf for "hot" gets deleted: the
    // stored bound goes loose (max over survivors < stored max) — the
    // pruning must stay LOSSLESS, merely less tight
    val docs = Seq(
      (1L, "hot hot hot hot hot rare1"),
      (2L, "hot cold cold"),
      (3L, "cold rare1 rare2"),
      (4L, "hot cold rare2"),
      (5L, "cold cold cold")).toDF("doc_id", "text")
    InvertedIndex.save(InvertedIndex.build(docs), dir)
    InvertedIndex.delete(spark, dir, Seq(1L))
    val idx = InvertedIndex.load(spark, dir)
    val (a, b) = runBoth(idx, Seq("hot", "rare1", "rare2"), 3)
    assert(a == b, s"$a vs $b")
    // and after compact the bound re-tightens to the exact survivor max
    InvertedIndex.compact(spark, dir)
    val cidx = InvertedIndex.load(spark, dir)
    val maxTf = cidx.termDf.filter($"term" === "hot")
      .collect()(0).getAs[Long]("max_tf")
    assert(maxTf == 1L, s"compact must re-derive the exact max, got $maxTf")
    val (a2, b2) = runBoth(cidx, Seq("hot", "rare1", "rare2"), 3)
    assert(a2 == b2)
  }

  test("filtered rankers: QL/phrase/proximity Among rank among allowed with corpus-wide stats") {
    // per-doc facts (occurrence counts, QL scores under corpus-wide
    // collection stats) are filter-invariant, so filtered top-k must
    // equal filter-then-rank of the unfiltered relation — and an
    // allowed doc ranked PAST the global top-k must still surface
    // (pre-filter, never post-filter)
    val docs = Seq(
      (1L, "big cat big cat big cat x"), // 3 occ — global #1, disallowed
      (2L, "big cat big cat y"),         // 2 occ — global #2, allowed
      (3L, "big cat z big z cat"),       // 1 occ + proximity material
      (4L, "big z z z cat"),             // 0 occ, proximity far
      (5L, "cat big")                    // reversed
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, withPositions = true)
    val allowed = docs.filter($"doc_id" % 2 === 0).select($"doc_id") // {2,4}
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // phrase: k=1 globally is doc 1 (disallowed); filtered must return
    // doc 2, not an empty post-filter of {doc 1}
    assert(pairs(InvertedIndex.phraseTopKAmong(
      idx, Seq("big", "cat"), 1, allowed)) == Seq(2L -> 2L))
    val phraseAll = pairs(InvertedIndex.phraseTopK(idx, Seq("big", "cat"), 10))
    val phraseFiltered = pairs(InvertedIndex.phraseTopKAmong(
      idx, Seq("big", "cat"), 10, allowed))
    assert(phraseFiltered == phraseAll.filter(p => p._1 % 2 == 0),
      s"$phraseFiltered vs filter-then-rank of $phraseAll")

    // proximity: window 3 over {big, cat} — doc 4's pair is 4 apart
    // (no window), docs 1/2/3/5 have close pairs; allowed {2,4} keeps 2
    val proxAll = pairs(InvertedIndex.proximityTopK(
      idx, Seq("big", "cat"), window = 3, k = 10))
    val proxFiltered = pairs(InvertedIndex.proximityTopKAmong(
      idx, Seq("big", "cat"), window = 3, k = 10, allowed))
    assert(proxFiltered == proxAll.filter(p => p._1 % 2 == 0) &&
      proxFiltered.nonEmpty)

    // QL: the filter must change WHO returns, never a returned doc's
    // SCORE (collection stats stay corpus-wide)
    val qlAll = pairs(InvertedIndex.qlTopK(idx, Seq("big", "cat"), 10, mu = 10.0))
    val qlFiltered = pairs(InvertedIndex.qlTopKAmong(
      idx, Seq("big", "cat"), 10, allowed, mu = 10.0))
    assert(qlFiltered == qlAll.filter(p => p._1 % 2 == 0) &&
      qlFiltered.nonEmpty,
      s"$qlFiltered vs filter-then-rank of $qlAll")
    // allowed = everyone reduces every Among form to the unfiltered probe
    val all = docs.select($"doc_id")
    assert(pairs(InvertedIndex.qlTopKAmong(
      idx, Seq("big", "cat"), 10, all, mu = 10.0)) == qlAll)
    assert(pairs(InvertedIndex.phraseTopKAmong(
      idx, Seq("big", "cat"), 10, all)) == phraseAll)
    assert(pairs(InvertedIndex.proximityTopKAmong(
      idx, Seq("big", "cat"), window = 3, k = 10, all)) == proxAll)
  }

  test("bm25TopKPrunedByQueryAmong: filtered batch equals per-query bm25TopKAmong") {
    val idx = built
    val docs = Tables.documents(spark, sf001)
    // the filter is selective AND skew-free: half the corpus by id parity
    val allowed = docs.filter(pmod($"doc_id", lit(2L)) === 0)
      .select($"doc_id")
    val byDf = idx.termDf.orderBy($"df", $"term").collect()
      .map(_.getString(0))
    val (rare, stops) = (byDf.take(3).toSeq, byDf.takeRight(2).toSeq)
    // the bm25TopKPrunedByQuery spec's query shapes, under the filter:
    // q1/q2 stop+rare (certification candidates), q3 all-stop (routes
    // direct), q4 single rare (may have < k allowed matches -> fallback),
    // q5 unindexed-only (no rows)
    val queries = Seq(
      (1L, stops.head), (1L, rare(0)),
      (2L, stops.head), (2L, rare(1)),
      (3L, stops(0)), (3L, stops(1)),
      (4L, rare(2)),
      (5L, "nosuchterm_xyzzy")).toDF("query_id", "term")
    val batch = InvertedIndex
      .bm25TopKPrunedByQueryAmong(idx, queries, 5, allowed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))
        .sortBy(t => (-t._2, t._1)).toSeq).toMap
    def single(terms: Seq[String]) =
      InvertedIndex.bm25TopKAmong(idx, terms, 5, allowed)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch(1L) == single(Seq(stops.head, rare(0))))
    assert(batch(2L) == single(Seq(stops.head, rare(1))))
    assert(batch(3L) == single(Seq(stops(0), stops(1))))
    assert(batch.getOrElse(4L, Seq.empty) == single(Seq(rare(2))))
    assert(!batch.contains(5L), "unindexed-only query must return no rows")
    // every returned doc respects the filter — pre-filter semantics,
    // never a post-filter under-return
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    batch.values.flatten.foreach { case (id, _) =>
      assert(allowedIds.contains(id), s"disallowed doc $id returned")
    }
  }

  test("batch WAND large-Q routing: past RouteIdLiteralCap the semi-join path ranks identically") {
    // a RAG-scale mixed plan: > RouteIdLiteralCap queries so BOTH the
    // pruned-ids scoring restriction and the fallback restriction take
    // the broadcast-semi-join branch instead of an isin literal list.
    // Shapes mix routed-direct (flat two-stop), certifiable (stop+rare),
    // and single-term queries; ranking must equal the one-pass exact
    // batch ranking for every query (lossless regardless of routing).
    val docs = (1L to 60L).map { i =>
      val rare = s"rare$i"
      val mid = s"mid${i % 7}"
      (i, s"common common $mid $rare" + (if (i % 3 == 0) " common" else ""))
    }.toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs)
    val nQ = InvertedIndex.RouteIdLiteralCap + 200
    val qrows = (1 to nQ).flatMap { q =>
      q % 3 match {
        case 0 => Seq((q.toLong, "common"), (q.toLong, s"mid${q % 7}"))
        case 1 => Seq((q.toLong, "common"), (q.toLong, s"rare${q % 60 + 1}"))
        case _ => Seq((q.toLong, s"rare${q % 60 + 1}"))
      }
    }
    val queries = qrows.toDF("query_id", "term")
    val k = 3
    val got = InvertedIndex.bm25TopKPrunedByQuery(idx, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact reference: ONE unpruned batch pass + per-query window cut
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"score_q".desc, $"doc_id")
    val want = InvertedIndex.bm25ScoresByQuery(idx, queries)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .select($"query_id", $"doc_id", $"score_q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"large-Q routing changed ranking: ${got.diff(want).take(5)} vs ${want.diff(got).take(5)}")
  }
}
