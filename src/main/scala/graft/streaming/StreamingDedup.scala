package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A band-bucket collision emitted by [[StreamingDedup.nearDupHits]]: the
  * arriving document shares `band`'s LSH bucket with an earlier document.
  * Any hit marks the arriving document as a near-dup CANDIDATE (the
  * consumer applies exact similarity if required, exactly as in the batch
  * pipeline).
  */
final case class BandHit(doc_id: Long, band: Int, first_doc_id: Long)

/** First-claimant of an LSH bucket. */
final case class BucketClaim(first: Long)

/** Streaming near-duplicate detection over a document firehose — the
  * ingest-time counterpart of the batch MinHash-LSH dedup family
  * (graft.operators.Dedup). Each arriving document computes the SAME
  * 32-hash MinHash signature and 8×4 band layout as the batch path; the
  * state keyed by (band, bucket) remembers only the FIRST claimant doc id,
  * and later arrivals in the same bucket emit a [[BandHit]].
  *
  * State profile: one long per distinct observed (band, bucket) —
  * O(bands · distinct-signatures), the inherent floor for dedup against
  * everything ever seen (same asymptotics as streaming dropDuplicates
  * state). There is deliberately NO timeout: corpus dedup state is
  * permanent by design; at production scale this state lives in the
  * RocksDB state store and is sharded by the (band, bucket) key — the
  * same equi-partitioning the batch bucket join uses, so no skewed or
  * global state. A hot (degenerate) bucket costs ONE state entry and one
  * hit row per arrival — the streaming layout is immune to the k² bucket
  * blowup the batch join needs a guard for.
  */
object StreamingDedup {

  /** @param sigs optional precomputed `Dedup.minhashSignatures` output
    *   (idCol + `minhash` array) for `docs`. In production the signature
    *   column arrives WITH the stream (computed once at ingest, the same
    *   persisted columnar artifact the batch dedup family shares) — passing
    *   it here skips re-running the shingle/minhash pass per consumer.
    */
  def nearDupHits(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 32, bands: Int = 8, rowsPerBand: Int = 4,
      shingleK: Int = 3, sigs: Option[DataFrame] = None): Dataset[BandHit] = {
    require(bands * rowsPerBand == numHashes,
      s"bands($bands) x rowsPerBand($rowsPerBand) must equal numHashes($numHashes)")
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = sigs
      .getOrElse(Dedup.minhashSignatures(docs, idCol, textCol, numHashes, shingleK))
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",",
              slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
          .as(Seq("band", "bucket")))
      .as[(Long, Int, Long)]

    def fn(key: (Int, Long), rows: Iterator[(Long, Int, Long)],
        state: GroupState[BucketClaim]): Iterator[BandHit] = {
      // arrival order within a micro-batch is not defined — lowest id
      // claims, mirroring the batch canonicalize convention (min id keeps)
      val sorted = rows.map(_._1).toVector.sorted
      if (sorted.isEmpty) Iterator.empty
      else state.getOption match {
        case Some(BucketClaim(first)) =>
          sorted.iterator.map(id => BandHit(id, key._1, first))
        case None =>
          state.update(BucketClaim(sorted.head))
          sorted.tail.iterator.map(id => BandHit(id, key._1, sorted.head))
      }
    }

    banded
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Retention-bounded twin of [[nearDupHits]] — the near-dup member of
    * the TTL family ([[StreamingTtlDedup]] is the exact member): a band
    * bucket's claim expires `ttlMs` after its claimant's event time, the
    * watermark sweeps dead entries, and a later arrival in an expired
    * bucket claims it fresh instead of emitting a hit. State becomes
    * O(distinct (band, bucket) within retention) — fixed by retention ×
    * ingest rate, the profile that lets the store run indefinitely. Same
    * analyzer constraints as the exact twin: the watermarked timestamp
    * must reach the stateful operator as a bare alias, and the sweep
    * timeout clamps above the current watermark.
    */
  def nearDupHitsTtl(docs: DataFrame, ttlMs: Long,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ts", watermarkDelay: String = "10 seconds",
      numHashes: Int = 32, bands: Int = 8, rowsPerBand: Int = 4,
      shingleK: Int = 3, sigs: Option[DataFrame] = None): Dataset[BandHit] = {
    require(bands * rowsPerBand == numHashes,
      s"bands($bands) x rowsPerBand($rowsPerBand) must equal numHashes($numHashes)")
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    val spark = docs.sparkSession
    import spark.implicits._
    // signature appended IN PLACE so the watermarked timestamp column
    // travels with it — a signature join-back would be a stream-stream join
    val withSig = sigs.getOrElse(
      docs.withColumn("minhash",
          Dedup.minhashUdf(numHashes, shingleK)(col(textCol)))
        .filter(col("minhash").isNotNull))
    val banded = withSig
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",",
              slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
          .as(Seq("band", "bucket")))
      .as[(Long, java.sql.Timestamp, Int, Long)]

    val ttlUs = ttlMs * 1000L
    def fn(key: (Int, Long), rows: Iterator[(Long, java.sql.Timestamp, Int, Long)],
        state: GroupState[(Long, Long)]): Iterator[BandHit] = {
      if (!rows.hasNext && state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        // deterministic in-batch order: (event time, doc id)
        val batch = rows.map(r => (r._2.getTime * 1000L, r._1)).toArray.sortInPlace()
        var (claimant, claimUs) = state.getOption.getOrElse((Long.MinValue, Long.MinValue))
        val out = batch.iterator.flatMap { case (eventUs, docId) =>
          val live = claimUs != Long.MinValue && eventUs < claimUs + ttlUs
          if (live) Some(BandHit(docId, key._1, claimant))
          else { claimant = docId; claimUs = eventUs; None }
        }.toArray
        state.update((claimant, claimUs))
        state.setTimeoutTimestamp(
          math.max((claimUs + ttlUs) / 1000L, state.getCurrentWatermarkMs + 1))
        out.iterator
      }
    }

    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
