package graft

import graft.operators.{HybridRetrieval, InvertedIndex, SimilaritySearch}
import graft.operators.HybridRetrieval.{DenseLeg, EnsembleLeg}
import org.apache.spark.sql.functions._

/** The N-ary ensemble serving verbs (r17 — [[HybridRetrieval
  * .rrfTopKLegs]] family). Load-bearing contracts:
  *   - the two-leg verbs are the special case: (Dense, Sparse) through
  *     the N-leg verb is BIT-EQUAL to rrfTopK/rrfTopKAmong (same leg
  *     order, same fold, same expressions);
  *   - N legs equal the hand-wired rankLeg + rrfFuseRanked composition
  *     the verb replaces (with the pre-filter organization the hand
  *     wiring always had to re-derive);
  *   - positional rankers (phrase / proximity) serve as ensemble legs
  *     with pre-filter semantics (verdict r16 item 8);
  *   - batch ≡ single-query per query id.
  */
class NLegEnsembleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001).cache()
  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val lexIdx = InvertedIndex.build(docs)
  private lazy val posIdx = InvertedIndex.build(docs, withPositions = true)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("two legs through rrfTopKLegs are bit-equal to the two-leg verbs") {
    val denseIdx = SimilaritySearch.buildIvfIndex(emb, nlist = 8)
    val terms = lexIdx.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    val qv = emb.filter($"vec_id" === 0)
    val legs = Seq(
      (EnsembleLeg.Dense(DenseLeg.Float32(denseIdx)): EnsembleLeg, 1.0),
      (EnsembleLeg.Sparse(lexIdx): EnsembleLeg, 1.0))
    assert(rows(HybridRetrieval.rrfTopKLegs(legs, terms, qv, k = 10,
        legK = 30)) ==
      rows(HybridRetrieval.rrfTopK(lexIdx, terms, denseIdx, qv, k = 10,
        legK = 30)),
      "unfiltered N-leg diverged from rrfTopK")
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id")
    assert(rows(HybridRetrieval.rrfTopKLegsAmong(legs, terms, qv, k = 10,
        allowed, legK = 30)) ==
      rows(HybridRetrieval.rrfTopKAmong(lexIdx, terms, denseIdx, qv,
        k = 10, allowed, legK = 30)),
      "filtered N-leg diverged from rrfTopKAmong")
    denseIdx.unpersist()
  }

  test("three legs equal the hand-wired rankLeg + rrfFuseRanked composition") {
    val denseIdx = SimilaritySearch.buildIvfIndex(emb, nlist = 8)
    val int8Idx = SimilaritySearch.buildIvfInt8Index(emb, nlist = 8)
    val terms = lexIdx.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    val qv = emb.filter($"vec_id" === 0)
    val np = SimilaritySearch.policyNprobe(8)
    val got = rows(HybridRetrieval.rrfTopKLegs(Seq(
        (EnsembleLeg.Dense(DenseLeg.Float32(denseIdx)), 0.5),
        (EnsembleLeg.Dense(DenseLeg.Int8(int8Idx)), 0.3),
        (EnsembleLeg.Sparse(lexIdx), 0.2)),
      terms, qv, k = 10, legK = 30))
    // the composition the verb replaces, wired by hand in leg order
    val legF = SimilaritySearch.ivfProbe(denseIdx, qv, 30, np)
      .select($"neighbor_id".as("doc_id"), $"rn".as("rank"))
    val legI = SimilaritySearch.ivfProbeInt8(int8Idx, qv, 30, np)
      .select($"neighbor_id".as("doc_id"), $"rn".as("rank"))
    val legL = HybridRetrieval.rankLeg(
      InvertedIndex.bm25TopK(lexIdx, terms, 30), "doc_id", "score_q")
    val want = rows(HybridRetrieval.rrfFuseRanked(Seq(legF, legI, legL),
        weights = Some(Seq(0.5, 0.3, 0.2)))
      .orderBy($"rrf".desc, $"doc_id").limit(10))
    assert(got.nonEmpty && got == want,
      "3-leg verb diverged from the hand-wired fusion")
    denseIdx.unpersist(); int8Idx.unpersist()
  }

  test("positional legs: phrase and proximity rank as ensemble legs with pre-filter semantics") {
    val denseIdx = SimilaritySearch.buildIvfIndex(emb, nlist = 8)
    // "table table" is the positional gates' standard phrase; proximity
    // needs distinct terms, so give it the two most frequent
    val freq = lexIdx.termDf.orderBy($"df".desc, $"term").limit(2)
      .collect().map(_.getString(0)).toSeq
    val qv = emb.filter($"vec_id" === 0)
    val got = rows(HybridRetrieval.rrfTopKLegs(Seq(
        (EnsembleLeg.Dense(DenseLeg.Float32(denseIdx)), 1.0),
        (EnsembleLeg.Proximity(posIdx, window = 8), 1.0)),
      freq, qv, k = 10, legK = 30))
    val legD = SimilaritySearch.ivfProbe(denseIdx, qv, 30,
        SimilaritySearch.policyNprobe(8))
      .select($"neighbor_id".as("doc_id"), $"rn".as("rank"))
    val legP = HybridRetrieval.rankLeg(
      InvertedIndex.proximityTopK(posIdx, freq, 8, 30),
      "doc_id", "n_windows")
    val want = rows(HybridRetrieval.rrfFuseRanked(Seq(legD, legP))
      .orderBy($"rrf".desc, $"doc_id").limit(10))
    assert(got.nonEmpty && got == want,
      "proximity leg diverged from the hand-wired fusion")
    // phrase leg under a filter: only allowed docs can surface, and its
    // ranks are ranks among allowed (pre-filter, not post-filter)
    val allowed = docs.filter($"doc_id" % 2 === 0).select($"doc_id")
    val filtered = rows(HybridRetrieval.rrfTopKLegsAmong(Seq(
        (EnsembleLeg.Phrase(posIdx), 1.0)),
      Seq("table", "table"), qv, k = 10,
      allowed = allowed.select($"doc_id".as("vec_id")), legK = 30,
      idCol = "vec_id"))
    assert(filtered.nonEmpty && filtered.forall(_._1 % 2 == 0))
    val wantF = rows(HybridRetrieval.rrfFuseRanked(Seq(
        HybridRetrieval.rankLeg(InvertedIndex.phraseTopKAmong(posIdx,
          Seq("table", "table"), 30, allowed), "doc_id", "n_occ")))
      .orderBy($"rrf".desc, $"doc_id").limit(10))
    assert(filtered == wantF,
      "filtered phrase leg diverged from phraseTopKAmong ranking")
    denseIdx.unpersist()
  }

  test("batch N-leg fusion equals the single-query verb per query id") {
    val denseIdx = SimilaritySearch.buildIvfIndex(emb, nlist = 8)
    val rare = lexIdx.termDf.orderBy($"df", $"term").limit(2)
      .collect().map(_.getString(0)).toSeq
    val freq = lexIdx.termDf.orderBy($"df".desc, $"term").limit(2)
      .collect().map(_.getString(0)).toSeq
    // slotted bags: the phrase leg reads slots, the others ignore them
    val qterms = (rare.zipWithIndex.map { case (t, s) => (0L, s, t) } ++
      freq.zipWithIndex.map { case (t, s) => (1L, s, t) })
      .toDF("query_id", "slot", "term")
    val qvecs = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val legs = Seq(
      (EnsembleLeg.Dense(DenseLeg.Float32(denseIdx)): EnsembleLeg, 0.6),
      (EnsembleLeg.Sparse(lexIdx): EnsembleLeg, 0.25),
      (EnsembleLeg.Phrase(posIdx): EnsembleLeg, 0.15))
    val batch = HybridRetrieval.rrfTopKLegsByQuery(legs, qterms, qvecs,
        k = 5, legK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(t => (t._1, -t._3, t._2))
    val want = Seq(0L -> rare, 1L -> freq).flatMap { case (qid, ts) =>
      HybridRetrieval.rrfTopKLegs(legs, ts,
          emb.filter($"vec_id" === qid), k = 5, legK = 20)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
    }.sortBy(t => (t._1, -t._3, t._2))
    assert(batch.nonEmpty && batch == want,
      "batch N-leg diverged from per-query N-leg fusion")
    // the filtered batch twin keeps the same per-query equality
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id")
    val batchF = HybridRetrieval.rrfTopKLegsByQueryAmong(legs, qterms,
        qvecs, k = 5, allowed = allowed, legK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(t => (t._1, -t._3, t._2))
    val wantF = Seq(0L -> rare, 1L -> freq).flatMap { case (qid, ts) =>
      HybridRetrieval.rrfTopKLegsAmong(legs, ts,
          emb.filter($"vec_id" === qid), k = 5, allowed = allowed,
          legK = 20)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
    }.sortBy(t => (t._1, -t._3, t._2))
    assert(batchF == wantF,
      "filtered batch N-leg diverged from per-query rrfTopKLegsAmong")
    denseIdx.unpersist()
  }

  test("a pinned dense nprobe under a filtered ensemble verb fails loudly") {
    val denseIdx = SimilaritySearch.buildIvfIndex(emb, nlist = 8)
    val terms = lexIdx.termDf.orderBy($"df", $"term").limit(2)
      .collect().map(_.getString(0)).toSeq
    val qv = emb.filter($"vec_id" === 0)
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id")
    val legs = Seq(
      (EnsembleLeg.Dense(DenseLeg.Float32(denseIdx),
        nprobe = Some(8)): EnsembleLeg, 1.0),
      (EnsembleLeg.Sparse(lexIdx): EnsembleLeg, 1.0))
    // pre-r18 the pin was silently dropped (the Among path serves through
    // the selectivity-capped auto dial) — a dead dial the caller believed
    // was live; now it is the loud contract
    val e = intercept[IllegalArgumentException] {
      HybridRetrieval.rrfTopKLegsAmong(legs, terms, qv, k = 10, allowed,
        legK = 30)
    }
    assert(e.getMessage.contains("nprobe") &&
      e.getMessage.contains("selectivity"))
    val eB = intercept[IllegalArgumentException] {
      HybridRetrieval.rrfTopKLegsByQueryAmong(legs,
        Seq((0L, terms.head)).toDF("query_id", "term"),
        qv.select($"vec_id".as("query_id"), $"embedding"),
        k = 5, allowed = allowed, legK = 20)
    }
    assert(eB.getMessage.contains("nprobe"))
    // the UNFILTERED verb still honors the pin (unchanged behavior)
    assert(HybridRetrieval.rrfTopKLegs(legs, terms, qv, k = 10, legK = 30)
      .count() > 0)
    denseIdx.unpersist()
  }
}
