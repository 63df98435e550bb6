package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One span occurrence's claim verdict: document `doc_id`'s span at
  * `seg_idx` either owns its content (`kept`) or repeats content first
  * claimed elsewhere.
  */
final case class SpanClaim(doc_id: Long, seg_idx: Int, kept: Boolean)

/** Streaming span-level exact dedup — the ingest-time twin of
  * [[graft.operators.Dedup.spanDedup]] (C4/RefinedWeb boilerplate
  * removal): arriving documents are cut map-only into fixed
  * `segTokens`-token spans, state keyed by the span content remembers the
  * FIRST claimant (doc id, span index), and every occurrence gets a
  * [[SpanClaim]] verdict the sink can fold into per-document clean text.
  *
  * Parity contract (StreamingSpec pins it): under ascending doc-id
  * arrival across ANY micro-batching, the kept set is EXACTLY the batch
  * operator's first-occurrence resolution — in-batch ties fold off the
  * iterator to the minimum (doc_id, seg_idx), and a claim, once made, is
  * permanent. Run in batch mode (one conceptual batch, empty state per
  * group) the verdicts ARE the batch operator's marked set, which makes
  * the gate query a full oracle.
  *
  * State profile: one (long, int) per distinct span ever seen — the
  * dedup-against-history floor, keyed by span text so the claim is exact
  * (a hash key would trade a collision-false-dedup for smaller state);
  * hash-sharded across the state store, RocksDB-resident at scale.
  */
object StreamingSpanDedup {

  def spanClaims(docs: DataFrame, segTokens: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[SpanClaim] = {
    val spark = docs.sparkSession
    import spark.implicits._

    // split let-bound through a single-element transform (the
    // Dedup.shingles pattern): an inlined split re-evaluates inside every
    // per-segment lambda element — O(tokens²) chars per row
    val segArray = transform(array(split(col(textCol), " ")), toks => {
      val nseg = ceil(size(toks).cast("double") / segTokens).cast("int")
      transform(sequence(lit(0), nseg - 1), i =>
        array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " "))
    }).getItem(0)
    val spans = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(segArray).as(Seq("seg_idx", "seg")))
      .as[(Long, Int, String)]

    def fn(seg: String, rows: Iterator[(Long, Int, String)],
        state: GroupState[(Long, Int)]): Iterator[SpanClaim] = {
      val batch = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      rows.foreach(r => batch += ((r._1, r._2)))
      if (batch.isEmpty) Iterator.empty
      else {
        // min (doc, idx) wins within a batch; the first batch's claim is
        // permanent, so later arrivals are never kept
        val claimant = state.getOption
        val owner = claimant.getOrElse(batch.min)
        if (claimant.isEmpty) state.update(owner)
        batch.iterator.map { case (d, i) =>
          SpanClaim(d, i, claimant.isEmpty && (d, i) == owner)
        }
      }
    }

    spans.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
