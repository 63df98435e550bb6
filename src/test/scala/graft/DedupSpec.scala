package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup keeps lowest id per identical text") {
    val df = docsDf(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "different text here"), (4L, "alpha beta gamma"))
    val out = Dedup.exact(df).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("shingles builds k-word shingles, short docs yield none") {
    val out = docsDf((1L, "a b c d"), (2L, "x y"))
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(out(1L) == Set("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("shinglesFast is element-for-element the HOF shingles on hostile text") {
    // the decontaminate explode paths run the row-local UDF; it must be the
    // HOF column's exact twin, including first-occurrence order, repeated
    // grams, empty words from double spaces, and size<k edges
    val texts = Seq(
      "a b c d", "x y", "", " ", "a  b c", "a a a a a", "a b a b a b",
      "one", "one two", "one two three", "  leading", "trailing  ",
      (1 to 50).map(i => s"w${i % 7}").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (k <- Seq(2, 3, 8)) {
      val both = df.select($"doc_id",
          Dedup.shingles($"text", k).as("hof"),
          Dedup.shinglesFast($"text", k).as("fast"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k doc=${r.getLong(0)}: hof=${r.getSeq[String](1)} fast=${r.getSeq[String](2)}")
      }
    }
    // NULL text: the HOF yields EMPTY (greatest() absorbs the null into
    // the sequence bound and the null grams filter out) — the twin must
    // match that, not propagate null
    val withNull = Seq((97L, None: Option[String]), (98L, Some("a b c")))
      .toDF("doc_id", "text")
      .select($"doc_id",
        Dedup.shingles($"text", 2).as("hof"),
        Dedup.shinglesFast($"text", 2).as("fast"))
      .collect()
    withNull.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"doc ${r.getLong(0)}: expected empty, got null")
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"null-text parity broken for doc ${r.getLong(0)}")
    }
  }

  test("minhash LSH finds identical and near-identical docs, skips distinct") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val far = (1 to 40).map(i => s"z$i").mkString(" ")
    val df = docsDf((1L, base), (2L, base), (3L, near), (4L, far))
    val pairs = Dedup.minhashNearDups(df, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L)), s"identical docs not paired: ${ids.mkString}")
    assert(pairs.collectFirst { case (1L, 2L, j) => j }.exists(_ == 1.0))
    assert(ids.contains((1L, 3L)) || ids.contains((2L, 3L)),
      s"near-dup not found: ${ids.mkString}")
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L), "distinct doc falsely paired")
  }

  test("simhash: identical docs have distance 0 and are paired; candidates symmetric-free") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = docsDf((1L, base), (2L, base), (3L, near), (10L, far))
    val fp = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    val pairs = Dedup.simhashNearDups(df, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(pairs.forall(p => p._1 < p._2), "pairs must be ordered (a<b)")
    assert(!pairs.exists(p => p._2 == 10L && p._3 > 6))
  }

  test("hot-bucket guard: tiny cap suppresses candidate pairs, large cap is a no-op") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = docsDf((1L, base), (2L, base), (3L, base), (4L, base))
    val sigs = Dedup.minhashSignatures(df)
    // all four docs identical → every bucket holds 4; cap 3 kills all pairs
    assert(Dedup.minhashCandidates(sigs, maxBucketSize = 3).count() == 0)
    // default cap leaves them intact
    assert(Dedup.minhashCandidates(sigs).count() == 6) // C(4,2)
  }

  test("canonicalize: transitive closure maps chains to the component min") {
    // chain 1~2, 2~3 plus separate pair 10~11: components {1,2,3}, {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalize(pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)))
    assert(out(3L) == ((1L, false)))
    assert(out(10L) == ((10L, true)))
    assert(out(11L) == ((10L, false)))
  }

  test("canonicalize distributed path agrees with driver union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    val driver = Dedup.canonicalize(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val distributed = Dedup.canonicalize(pairs, driverThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(driver == distributed, s"driver=$driver distributed=$distributed")
  }

  test("canonicalize distributed path collapses a long chain within the round bound") {
    // a 120-link chain has diameter 120: plain min-label propagation would
    // need 120 rounds, far past maxRounds=10 — large-star/small-star must
    // finish inside it. Shuffled edge order and reversed orientation mix in.
    val links = scala.util.Random.shuffle(
      (1L until 121L).map(i => if (i % 3 == 0) (i + 1, i) else (i, i + 1)).toList)
    val pairs = links.toDF("id_a", "id_b")
    val out = Dedup.canonicalize(pairs, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 121)
    assert(out.values.forall(_ == 1L), s"non-root reps: ${out.filter(_._2 != 1L)}")
  }

  test("canonicalize distributed path matches driver union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .toDF("id_a", "id_b")
    val driver = Dedup.canonicalize(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val distributed = Dedup.canonicalize(pairs, driverThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(driver == distributed)
  }

  test("canonicalize distributed path keeps self-pair-only docs as their own keeper") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalize(pairs, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(5L) == ((5L, true)))
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)))
  }

  test("canonicalize distributed path works on string ids") {
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("id_a", "id_b")
    val out = Dedup.canonicalize(pairs, driverThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("canonicalize under-budgeted rounds still emits chain-free labels") {
    // a 60-link path with maxRounds=1: the star loop cannot converge, so
    // the fallback pointer-jumping flatten must guarantee the output
    // invariant — every canonical_id is itself canonical (no rep chains)
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.canonicalize(pairs, maxRounds = 1, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.values.foreach { c =>
      assert(out.getOrElse(c, c) == c, s"rep chain: canonical $c maps to ${out(c)}")
    }
  }

  test("canonicalize composes with minhash pairs end to end") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = docsDf((5L, base), (9L, base), (2L, base), (100L, "totally different words here entirely"))
    val pairs = Dedup.minhashNearDups(df, threshold = 0.9)
    val canon = Dedup.canonicalize(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon(5L) == 2L && canon(9L) == 2L && canon(2L) == 2L)
    assert(!canon.contains(100L)) // never paired → not in the dup graph
  }

  test("spanDedup keeps the first corpus-wide occurrence of each span") {
    // 4-token spans; doc 1 and doc 2 share an identical first span
    // ("license header"); doc 2's second span is unique; doc 3 is a full
    // duplicate of doc 1 and must survive as an empty shell
    val df = docsDf(
      (1L, "copy right head er body one two three"),
      (2L, "copy right head er other unique body here"),
      (3L, "copy right head er body one two three"))
    val out = Dedup.spanDedup(df, segTokens = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((2L, 2L, "copy right head er body one two three")))
    assert(out(2L) == ((2L, 1L, "other unique body here")))
    assert(out(3L) == ((2L, 0L, "")))
  }

  test("spanDedup dedupes repeats within a single document, keeping the earliest") {
    val df = docsDf((7L, "a b a b a b c d"))
    val out = Dedup.spanDedup(df, segTokens = 2).collect()
    assert(out.length == 1)
    val r = out.head
    // spans: "a b","a b","a b","c d" → keep idx 0 and "c d"
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getString(3) == "a b c d")
  }

  test("spanDedup trailing partial span is its own unit") {
    val df = docsDf((1L, "x y z"), (2L, "x y z q"))
    val out = Dedup.spanDedup(df, segTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // doc1 spans: "x y","z"; doc2 spans: "x y","z q" — only "x y" collides
    assert(out(1L) == "x y z")
    assert(out(2L) == "z q")
  }

  test("decontaminate flags exactly the docs sharing a benchmark n-gram") {
    val docs = Tables.documents(spark, sf001)
    val bench = docs.filter($"doc_id" % 50 === 0)
    val corpus = docs.filter($"doc_id" % 50 =!= 0)
    val out = Dedup.decontaminate(corpus, bench, n = 3)
    // plan shape: benchmark grams must broadcast — the corpus never shuffles
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "benchmark gram join is not broadcast")
    val flags = out.collect().map(r =>
      r.getLong(r.fieldIndex("doc_id")) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    // independent ground truth via driver-side shingle sets
    val benchGrams = bench.select(explode(Dedup.shingles($"text", 3)))
      .collect().map(_.getString(0)).toSet
    val corpusGrams = corpus.select($"doc_id", Dedup.shingles($"text", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    corpusGrams.foreach { case (id, grams) =>
      assert(flags(id) == grams.exists(benchGrams.contains),
        s"doc $id flag ${flags(id)} vs truth ${grams.exists(benchGrams.contains)}")
    }
    // both outcomes must occur or the rule is vacuous on this corpus
    assert(flags.values.exists(identity) && !flags.values.forall(identity))
  }

  test("minhash est_jaccard tracks true shingle jaccard on testdata docs") {
    val docs = Tables.documents(spark, sf001).limit(100).cache()
    val flagged = Dedup.minhashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // true 3-gram jaccard for every flagged pair, computed independently
    val shingleSets = docs
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    flagged.foreach { case (a, b, est) =>
      val (sa, sb) = (shingleSets(a), shingleSets(b))
      val truth = (sa & sb).size.toDouble / (sa | sb).size
      // 32-hash estimate: sd ≈ sqrt(j(1-j)/32) ≤ 0.09 → 3.5 sd band
      assert(math.abs(est - truth) < 0.32,
        s"pair ($a,$b): est=$est truth=$truth")
    }
  }

  test("incremental dedup: batch probes corpus for exact and near dups") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls softly on the quiet empty village square at dusk tonight"
    val corpus = Seq(
      (100L, base),
      (101L, "completely different text about spark shuffles joins and " +
        "aggregations running on large distributed clusters every day"),
      (102L, "yet another unrelated document describing parquet files and " +
        "column pruning with predicate pushdown for analytic scans"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),                                    // exact dup of 100
      (2L, base.replace("dusk", "dawn")),            // near dup of 100
      (3L, "a totally novel arrival document with words shared by nothing " +
        "else in the existing corpus about gardening and fresh tomatoes"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, corpus, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(r.fieldIndex("exact_dup")),
          Option(r.get(r.fieldIndex("near_dup_of"))).map(_.toString.toLong))))
      .toMap
    assert(out(1L) == ((true, Some(100L))), s"exact dup: ${out(1L)}")
    assert(out(2L)._1 == false && out(2L)._2 == Some(100L), s"near dup: ${out(2L)}")
    assert(out(3L) == ((false, None)), s"novel: ${out(3L)}")
    // precomputed corpus signatures (the persisted-artifact path) agree
    val sigs = Dedup.minhashSignatures(corpus)
    val out2 = Dedup.incrementalDedup(batch, corpus, threshold = 0.5,
        corpusSigs = Some(sigs))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("near_dup_of"))).map(_.toString.toLong)).toMap
    assert(out2(2L) == Some(100L) && out2(3L).isEmpty)
  }

  test("leakage-safe split: string ids get a non-null side, clusters co-assigned") {
    // string canonical ids null-cast under the old numeric-only hash,
    // assigning dup clusters to NEITHER split — must never regress
    val docs = Seq(
      ("doc-a", "same text"), ("doc-b", "same text"), ("doc-c", "same text"),
      ("doc-d", "unique one"), ("doc-e", "unique two"))
      .toDF("doc_id", "text")
    val pairs = Seq(("doc-a", "doc-b"), ("doc-a", "doc-c")).toDF("id_a", "id_b")
    // 50% test fraction so both sides are plausibly populated
    val out = Dedup.leakageSafeSplit(docs, pairs, testPpm = 500000L)
      .select($"doc_id", $"canonical_id", $"is_test").collect()
    assert(out.length == 5)
    assert(out.forall(r => !r.isNullAt(2)), "null is_test: row on neither side")
    val cluster = out.filter(r => Set("doc-a", "doc-b", "doc-c")(r.getString(0)))
    assert(cluster.map(_.getString(1)).toSet == Set("doc-a"), "cluster not canonical")
    assert(cluster.map(_.getBoolean(2)).toSet.size == 1, "dup cluster split across sides")
  }

  test("k-fold split: clusters land whole in one fold, folds cover the range") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text")) ++
      (4L to 200L).map(i => (i, s"unique $i"))
    val df = docs.toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.leakageSafeFolds(df, pairs, k = 5)
      .select($"doc_id", $"fold").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 200)
    assert(out.values.forall(f => f >= 0 && f < 5), "fold outside [0, k)")
    assert(Set(out(1L), out(2L), out(3L)).size == 1,
      "duplicate cluster split across folds")
    // 200 hash-spread docs must touch every fold
    assert(out.values.toSet == Set(0, 1, 2, 3, 4),
      s"folds not covered: ${out.values.toSet}")
  }

  test("polyHash31 is the Java hashCode recurrence mod 2^31-1 over code points") {
    // BigInt oracle of the recurrence the DuckDB twin replays
    // (Exact.POLYHASH31: unicode() per split character, (h*31+c) mod p).
    // Includes a supplementary-plane char — the JVM loop must advance by
    // code POINT (charCount 2), matching DuckDB's per-character split.
    val p = BigInt(2147483647L)
    val cases = Seq("", "a", "abc", "hello world", "café",
      "é", new String(Character.toChars(0x1F600)) + "x")
    cases.foreach { s =>
      var want = BigInt(0)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        want = (want * 31 + cp) mod p
        i += Character.charCount(cp)
      }
      assert(Dedup.polyHash31(s) == want.toLong, s"polyHash31 diverges on '$s'")
    }
    assert(Dedup.polyHash31("abc") == 96354L) // == "abc".hashCode (< p)
  }

  test("minhash permutation coefficients are independent draws, not linear in j") {
    // the round-6 regression this family had: a_j = a1*(j+1) makes every
    // h_j a scalar multiple of h_0 and est_jaccard collapses toward 1 for
    // docs sharing ONE small-hash shingle. Pin a_j in [1, p-1], b_j in
    // [0, p-1], all distinct, and no common-ratio structure.
    val p = 2147483647L
    val as = (0 until 32).map(Dedup.permA)
    val bs = (0 until 32).map(Dedup.permB)
    assert(as.forall(a => a >= 1 && a < p) && bs.forall(b => b >= 0 && b < p))
    assert(as.distinct.size == 32 && bs.distinct.size == 32)
    // a_j linear in (j+1) would make a_j * inverse(a_0) == (j+1) for all j
    val ratioLinear = (1 until 32).forall { j =>
      BigInt(as(j)) * BigInt(as.head).modInverse(BigInt(p)) % BigInt(p) ==
        BigInt(j + 1)
    }
    assert(!ratioLinear, "permA is linear in j — correlated permutations")
  }

  test("knuth32 matches (id * 2654435761) mod 2^32 exactly, huge ids included") {
    // ids past ~3.47e9 wrap the naive Long product; the limb-split form
    // must still equal the true mathematical value (BigInt oracle)
    val ids = Seq(0L, 1L, 12345L, 3470000000L, Int.MaxValue.toLong * 7,
      Long.MaxValue, -1L, -3470000001L)
    val got = ids.toDF("id").select(Dedup.knuth32($"id").as("h"))
      .collect().map(_.getLong(0))
    val want = ids.map { id =>
      ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong
    }
    assert(got.toSeq == want, s"knuth32 diverges: ${ids.zip(got).zip(want)}")
  }

  test("bloom-pruned decontamination flags exactly the exact path's set") {
    val docs = Tables.documents(spark, sf001)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    def flags(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("contaminated")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exact = flags(Dedup.decontaminate(corpus, bench, n = 3))
    val bloom = flags(Dedup.decontaminateBloom(corpus, bench, n = 3))
    assert(bloom == exact)
    // even a deliberately sloppy filter (50% FPR) must stay exact — the
    // verify join, not the bloom, decides the flag
    val sloppy = flags(Dedup.decontaminateBloom(corpus, bench, n = 3, fpp = 0.5))
    assert(sloppy == exact)
    assert(exact.values.exists(identity) && exact.values.exists(!_))
  }
}
