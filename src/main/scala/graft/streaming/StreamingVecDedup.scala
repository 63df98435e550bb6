package graft.streaming

import graft.operators.SimilaritySearch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EMBEDDING near-duplicate detection — the vector twin of
  * [[StreamingDedup]] (which covers text MinHash): each arriving vector
  * computes the same 128-bit SRP sign sketch as the batch ANN family
  * (graft.operators.SimilaritySearch.srpSketch), the sketch splits into
  * `bits/bandBits` bands, and state keyed by (band, bucket) remembers the
  * FIRST claimant — later arrivals sharing any band bucket emit a
  * [[BandHit]] candidate (the consumer applies exact cosine if required,
  * exactly like the batch LSH candidate path).
  *
  * Banding math (P[bit agrees] = 1 − θ/π): a true near-dup at cosine
  * ≈ 0.95 agrees per bit w.p. ≈ 0.90, so a 16-bit band collides w.p.
  * ≈ 0.19 and 8 bands give ≈ 1 − (1 − 0.19)⁸ ≈ 0.81 candidate recall —
  * rising steeply toward 1 as cosine → 1 (exact duplicates always collide
  * on every band). Unrelated vectors (cosine ≈ 0) collide per band w.p.
  * 2⁻¹⁶ — the same false-positive economics as the text bands.
  *
  * State profile: one long per distinct observed (band, bucket) —
  * O(bands · distinct-sketches), sharded by the (band, bucket) key like
  * every state store in this family; a hot bucket costs one entry and one
  * hit row per arrival (immune to the k² batch-join blowup by
  * construction). No timeout: corpus dedup state is permanent by design.
  */
object StreamingVecDedup {

  def nearDupHits(vecs: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 128, bandBits: Int = 16, seed: Long = 42L,
      sketch: Option[DataFrame] = None): Dataset[BandHit] = {
    require(bits % bandBits == 0 && bandBits <= 32,
      s"bits=$bits must split into bands of bandBits=$bandBits <= 32")
    val bands = bits / bandBits
    val words = bits / 64
    val spark = vecs.sparkSession
    import spark.implicits._
    // production shape: the sketch columns arrive WITH the stream (the
    // same persisted artifact the batch Hamming scan reads); recomputed
    // inline only when absent
    val sk = sketch.getOrElse(SimilaritySearch.srpSketch(vecs, bits, seed, idCol, vecCol))
    // band b = bandBits-wide slice of word (b*bandBits)/64 — pure codegen
    // bit arithmetic, no UDF on the stream
    val bandCols = (0 until bands).map { b =>
      val word = (b * bandBits) / 64
      val shift = (b * bandBits) % 64
      struct(lit(b).as("band"),
        shiftrightunsigned(col(s"sig$word"), shift)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bucket"))
    }
    val banded = sk
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      .as[(Long, Int, Long)]

    def fn(key: (Int, Long), rows: Iterator[(Long, Int, Long)],
        state: GroupState[BucketClaim]): Iterator[BandHit] = {
      // lowest id claims within a micro-batch (arrival order is undefined),
      // mirroring the batch canonicalize convention
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
}
