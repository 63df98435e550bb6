package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document's retention-aware dedup verdict: `dup` means content
  * identical to a LIVE earlier claim (one younger than the TTL).
  */
final case class TtlDupVerdict(doc_id: Long, event_us: Long, dup: Boolean)

/** Exact streaming dedup with RETENTION — the operable state profile for
  * a firehose that runs forever. The NoTimeout twins
  * ([[StreamingDedup]], [[StreamingSpanDedup]], [[StreamingChunkDedup]])
  * dedup against ALL history, the right semantics for corpus
  * construction where state is the product; this variant bounds state by
  * an event-time TTL instead: a claim on a content key expires `ttlMs`
  * after its claimant's event time, the watermark garbage-collects the
  * expired entry from the store, and the same content arriving later
  * than the TTL is kept again. State is O(distinct keys within the
  * retention horizon) — fixed by retention × ingest rate, not by stream
  * lifetime, which is what lets the RocksDB store run indefinitely at
  * 100 TB/day without compaction-by-outage.
  *
  * Expiry is decided twice, deliberately: rows arriving AFTER a claim's
  * horizon re-claim inline (the state may not have been swept yet — the
  * timeout only fires when the watermark passes it), and groups with no
  * arrivals drop their entry in the `hasTimedOut` sweep. In-batch order
  * is resolved deterministically by (event time, doc id), so verdicts
  * are reproducible under any micro-batching of the same timestamped
  * data (StreamingSpec pins both paths).
  */
object StreamingTtlDedup {

  /** @param docs streaming frame with `idCol` (castable to long), `textCol`
    *   and an event-time `tsCol` (timestamp)
    * @param ttlMs claim lifetime measured from the claimant's event time
    * @param watermarkDelay lateness bound handed to `withWatermark` —
    *   also the sweep lag: entries expire at claim + ttl but are removed
    *   once the watermark (max event time − delay) passes that point
    */
  def dupVerdicts(docs: DataFrame, ttlMs: Long,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ts",
      watermarkDelay: String = "10 seconds"): Dataset[TtlDupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")

    // the watermarked TIMESTAMP column must survive UNTOUCHED into the
    // stateful operator — any expression over it (a cast, unix_micros)
    // strips the watermark tag and the analyzer rejects the event-time
    // timeout; a bare alias propagates the tag. Micros are derived in fn
    val keyed = docs.withWatermark(tsCol, watermarkDelay)
      .select(col(textCol).cast("string").as("k"),
        col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"))
      .as[(String, Long, java.sql.Timestamp)]

    val ttlUs = ttlMs * 1000L

    def fn(key: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
        state: GroupState[Long]): Iterator[TtlDupVerdict] = {
      if (!rows.hasNext && state.hasTimedOut) {
        // watermark passed claim + ttl with no new arrivals: sweep
        state.remove()
        Iterator.empty
      } else {
        // deterministic in-batch resolution: earliest (event, id) first
        val batch = rows.map(r => (r._3.getTime * 1000L, r._2))
          .toArray.sortInPlace()
        var claim = state.getOption.getOrElse(Long.MinValue)
        val out = batch.iterator.map { case (eventUs, docId) =>
          val live = claim != Long.MinValue && eventUs < claim + ttlUs
          if (!live) claim = eventUs // expired (or first ever): re-claim
          TtlDupVerdict(docId, eventUs, live)
        }.toArray
        state.update(claim)
        // GC point: when the watermark passes the live claim's horizon the
        // entry is dead weight — schedule the sweep there (clamped: the
        // timeout API rejects timestamps at or before the watermark)
        state.setTimeoutTimestamp(
          math.max((claim + ttlUs) / 1000L, state.getCurrentWatermarkMs + 1))
        out.iterator
      }
    }

    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
