package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-batch construction (north-star
  * pipeline op): assign documents to fixed-token-capacity training
  * sequences. Two published layouts:
  *
  *  - [[packChunked]] — "concat then chunk": documents are laid out
  *    contiguously in a deterministic order and cut every `maxTokens`
  *    tokens; a document belongs to the bin its start offset falls in (the
  *    GPT-style packing where sequences may straddle chunk boundaries).
  *    Pure window arithmetic over exact integer running sums → fully
  *    cross-engine oracle-able.
  *
  *  - [[packGreedy]] — capacity-respecting first-fit: a document never
  *    splits; a bin closes when the next document would overflow it.
  *    Imperative per-partition state → mapPartitions, spec-verified
  *    (capacity invariant, no loss, determinism).
  *
  * Scale design for both: documents are sharded by a deterministic
  * partition key (`doc_id % shards`) and packing state is LOCAL to a
  * shard — no global sequential pass, no driver state. Bins never cross
  * shards, which is exactly how a 1000-executor packer runs: shard-local
  * bin ids composed as (shard << 33 | local index), mirroring
  * monotonically_increasing_id's layout. One shuffle (the shard
  * repartition) regardless of corpus size; bin assembly downstream
  * (gather/concat of a bin's documents) groups by bin id with map-side
  * combine.
  */
object SeqPack {

  /** Deterministic shard key: doc_id % shards (NOT range partitioning,
    * whose sampled boundaries are nondeterministic across runs).
    */
  private def sharded(docs: DataFrame, idCol: String, tokenCol: String,
      shards: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(tokenCol).cast("long").as("n_tokens"),
        pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"))

  /** Shard-count resolution: the shard count bounds BOTH packing paths'
    * parallelism (per-shard window / per-shard fill state), so the default
    * (`shards = 0`) derives it from `spark.sql.shuffle.partitions` — the
    * session's parallelism dial — rather than a fixed constant that would
    * funnel a 100 TB corpus through a handful of single-task sorts. Pass an
    * explicit count when bin ids must be reproducible across differently
    * sized sessions/engines (bin ids are a function of the shard count; the
    * oracle-checked queries pin 8 to match their SQL).
    */
  private def resolveShards(docs: DataFrame, shards: Int): Int =
    if (shards > 0) shards
    else math.max(1,
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "8").toInt)

  /** Concat-then-chunk packing: within each shard, documents ordered by id
    * are laid end-to-end and a document's bin is
    * floor(start_offset / maxTokens). Returns
    * (doc_id, n_tokens, shard, start_offset, bin_id) with
    * bin_id = shard·2³³ + local chunk index.
    */
  def packChunked(docs: DataFrame, tokenCol: String, maxTokens: Int,
      idCol: String = "doc_id", shards: Int = 0): DataFrame = {
    require(maxTokens > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded(docs, idCol, tokenCol, resolveShards(docs, shards))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin_id",
        col("shard") * lit(1L << 33) + floor(col("start_offset") / lit(maxTokens.toLong)).cast("long"))
  }

  /** First-fit greedy packing: within each shard (ordered by id), a bin
    * accumulates documents until the next would exceed `maxTokens`; an
    * oversized document gets a bin of its own. Returns
    * (doc_id, n_tokens, bin_id). Deterministic: shard key and intra-shard
    * order are functions of doc_id alone.
    */
  def packGreedy(docs: DataFrame, tokenCol: String, maxTokens: Int,
      idCol: String = "doc_id", shards: Int = 0): DataFrame = {
    require(maxTokens > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val nShards = resolveShards(docs, shards)
    val prepared = sharded(docs, idCol, tokenCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("shard"))
      .as[(Long, Long, Long)]
    prepared.mapPartitions { it =>
      // a partition may hold several shards (hash collisions when
      // shards > partitions never happens here since we repartition(shards),
      // but pmod hashing can still co-locate two shard values) — keep
      // per-shard fill state
      val fill = scala.collection.mutable.Map.empty[Long, (Long, Long)] // shard -> (localBin, used)
      it.map { case (id, tok, shard) =>
        val (bin, used) = fill.getOrElse(shard, (0L, 0L))
        val (nbin, nused) =
          if (used > 0L && used + tok > maxTokens) (bin + 1L, tok)
          else (bin, used + tok)
        fill(shard) = (nbin, nused)
        (id, tok, shard * (1L << 33) + nbin)
      }
    }.toDF("doc_id", "n_tokens", "bin_id")
  }
}
