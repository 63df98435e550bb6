package graft.streaming

import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A chunk-level duplication hit: the arriving document's chunk (at
  * `chunk_idx`) repeats content first claimed by `owner_doc`.
  */
final case class ChunkHit(doc_id: Long, chunk_idx: Long, owner_doc: Long)

/** Streaming chunk-level dedup over a document firehose — the ingest-time
  * twin of [[graft.operators.Cdc]] chunking + hash-group dedup, and the
  * sub-document sibling of [[StreamingDedup]]: documents CDC-chunk
  * map-only as they arrive (the edit-stable boundaries mean a re-ingested
  * lightly-edited document still collides on its unchanged chunks), state
  * keyed by chunk hash remembers the FIRST claimant (doc, chunk), and
  * later arrivals of the same content emit a [[ChunkHit]].
  *
  * In-batch determinism: claims fold off the iterator taking the MINIMUM
  * (doc_id, chunk_idx) as owner, so a micro-batch containing both copies
  * resolves the same way regardless of arrival order. State profile: one
  * long per distinct chunk hash ever seen — the inherent floor for
  * dedup-against-history (identical to streaming dropDuplicates /
  * [[StreamingDedup]] claims state; RocksDB-resident and hash-sharded at
  * production scale, no skew or global state).
  */
object StreamingChunkDedup {

  def chunkDupHits(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      window: Int = 4, modulus: Int = 16,
      minLen: Int = 8, maxLen: Int = 64): Dataset[ChunkHit] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fn(hash: String, rows: Iterator[(String, Long, Long)],
        state: GroupState[(Long, Long)]): Iterator[ChunkHit] = {
      // first-wins across batches (the claim is permanent); min-wins within
      // a batch, so one micro-batch containing both copies resolves the
      // same way regardless of arrival order. The buffer holds only this
      // batch's copies of ONE chunk hash.
      val batch = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      rows.foreach(r => batch += ((r._2, r._3)))
      if (batch.isEmpty) Iterator.empty
      else {
        val owner = state.getOption.getOrElse(batch.min)
        if (!state.exists) state.update(owner)
        batch.iterator
          .filter(_ != owner)
          .map { case (d, i) => ChunkHit(d, i, owner._1) }
      }
    }

    Cdc.chunkDocuments(docs, idCol, textCol, window, modulus, minLen, maxLen)
      .select(col("chunk_hash"), col(idCol).cast("long").as("id"),
        col("chunk_idx"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
