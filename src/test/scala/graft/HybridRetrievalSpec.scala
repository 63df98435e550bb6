package graft

import graft.operators.{HybridRetrieval, InvertedIndex, SimilaritySearch}
import org.apache.spark.sql.functions._

/** The hybrid (dense+sparse) RRF operator: fusion semantics (union vs
  * anchored universes, deterministic leg-order fold), the allowed=all
  * reduction of the filtered verb, and pre-filter membership. The
  * FULL-oracle gates (vx_hybrid_rrf_top10 re-served through the
  * operator hash-unchanged; vx_hybrid_rrf_filtered_quantized replaying
  * both legs + fusion in DuckDB) pin the arithmetic end-to-end.
  */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001).cache()
  private lazy val docs = Tables.documents(spark, sf001)

  test("rrfFuseRanked: union vs anchored universes, exact leg-order fold") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val union = HybridRetrieval.rrfFuseRanked(Seq(a, b), k0 = 60.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(union.keySet == Set(1L, 2L, 3L), "fusion universe must be the union")
    // the fold is IN LEG ORDER from 0.0 — bit-equal to the hand-wired sum
    assert(union(2L) == 0.0 + (1.0 / 62.0) + (1.0 / 61.0))
    assert(union(1L) == 0.0 + (1.0 / 61.0))
    assert(union(3L) == 0.0 + (1.0 / 62.0))
    // anchored: the corpus-covering-leg convention keeps leg 0's members
    val anchored = HybridRetrieval.rrfFuseRanked(Seq(a, b), anchor = Some(0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(anchored.keySet == Set(1L, 2L))
    assert(anchored(2L) == union(2L), "anchoring must not change the sum")
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrfFuseRanked(Seq(a, b), anchor = Some(2))
    }
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrfFuseRanked(Seq.empty)
    }
  }

  test("rankLeg equals a row_number ranking by (score desc, id)") {
    val scored = Seq((5L, 10L), (6L, 30L), (7L, 10L)).toDF("doc_id", "score_q")
    val got = HybridRetrieval.rankLeg(scored, "doc_id", "score_q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(6L -> 1L, 5L -> 2L, 7L -> 3L))
  }

  test("rrfTopKAmong with allowed = everything is bit-equal to rrfTopK") {
    val lexIdx = InvertedIndex.build(docs)
    val denseIdx = SimilaritySearch.buildIvfIndex(emb, nlist = 8)
    val terms = lexIdx.termDf.orderBy($"df", $"term").limit(3)
      .collect().map(_.getString(0)).toSeq
    val qv = emb.filter($"vec_id" === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val unfiltered = rows(HybridRetrieval.rrfTopK(
      lexIdx, terms, denseIdx, qv, k = 10, legK = 30))
    // allowed = every id: the auto dial resolves selectivity 1 → the
    // same policy nprobe rrfTopK defaults to, both semi-joins keep
    // everything — identical rows INCLUDING the fused doubles
    val all = rows(HybridRetrieval.rrfTopKAmong(
      lexIdx, terms, denseIdx, qv, k = 10,
      allowed = emb.select($"vec_id"), legK = 30))
    assert(unfiltered.nonEmpty && all == unfiltered,
      "allowed=all must reduce to the unfiltered verb bit-for-bit")
    // pre-filter semantics: a selective filter returns only allowed
    // docs, ranked among allowed through BOTH legs
    val filtered = rows(HybridRetrieval.rrfTopKAmong(
      lexIdx, terms, denseIdx, qv, k = 10,
      allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id"),
      legK = 30))
    assert(filtered.nonEmpty && filtered.forall(_._1 % 3 == 0))
    denseIdx.unpersist()
  }
}
