package graft.streaming

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A curated survivor emitted by [[StreamingCuration.cleanStream]]:
  * rule-passing, PII-redacted, first unique copy of its content.
  */
final case class CuratedDoc(doc_id: Long, source: String, text: String)

/** The COMPOSED ingest-time curation pipeline — the streaming twin of
  * [[graft.pipelines.CorpusCuration]] stages 1–3, chained the way a
  * production firehose runs them:
  *
  *   1. quality rules (Gopher pack + bigram duplication fraction) —
  *      stateless map, identical column arithmetic to the batch pass;
  *   2. PII redaction — stateless map on the survivors (redact BEFORE the
  *      content hash, as in batch: two docs differing only in redacted
  *      spans are the same training document);
  *   3. exact dedup — GroupState keyed by the redacted content hash
  *      remembers the first claimant; later copies are dropped.
  *
  * Parity contract (StreamingSpecs pins it): when documents arrive in
  * ascending doc_id order across ANY micro-batching, the survivor set is
  * EXACTLY the batch pipeline's stage-3 survivors (batch keeps the min
  * doc_id per content group; the stream's first-wins claim + min-id
  * fold inside each batch reduce to the same choice under ordered
  * arrival). State profile: one long per distinct surviving content hash
  * — the dedup-against-history floor, hash-sharded, RocksDB-resident at
  * scale; rule/redact stages carry no state at all.
  */
object StreamingCuration {

  def cleanStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      dupFracMax: Double = 0.4): Dataset[CuratedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._

    val ruled = docs
      .filter(TextOps.gopherRules(col(textCol)).getField("keep") &&
        TextOps.bigramDupFraction(col(textCol)) <= dupFracMax)
      .select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).cast("string").as("source"),
        TextOps.redactPii(col(textCol)).as("text"))
      .withColumn("__h", xxhash64(col("text")))
      .as[(Long, String, String, Long)]

    def fn(hash: Long, rows: Iterator[(Long, String, String, Long)],
        state: GroupState[Long]): Iterator[CuratedDoc] = {
      // min-id wins within a batch (arrival order inside a micro-batch is
      // undefined); the first batch to claim a hash wins across batches
      val best = rows.foldLeft(Option.empty[(Long, String, String, Long)]) {
        case (acc, r) => acc match {
          case Some(b) if b._1 <= r._1 => acc
          case _ => Some(r)
        }
      }
      best match {
        case None => Iterator.empty
        case Some(b) =>
          if (state.exists) Iterator.empty // content already claimed
          else {
            state.update(b._1)
            Iterator.single(CuratedDoc(b._1, b._2, b._3))
          }
      }
    }

    ruled
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
