package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale document deduplication (north-star pipeline ops; SURVEY.md
  * §7.2 step 5). Each variant is pure DataFrame API so Catalyst plans it:
  *
  *  - exact: hash-groupBy — one shuffle on the content hash.
  *  - MinHash + LSH banding: shingle → per-shingle universal hashes →
  *    per-doc min per hash (map-side combinable agg) → band signatures →
  *    band-bucket self-join restricted to equal buckets. The candidate join
  *    is an equi-join on (band, bucket-hash) so Spark shuffles only bucket
  *    keys, never the O(n²) pair space.
  *  - SimHash: 64-bit weighted-bit fingerprint; near-dup = small Hamming
  *    distance, candidate generation by block rotation (4 blocks of 16 bits;
  *    dups within Hamming ≤ 3 share ≥ 1 exact block — pigeonhole).
  *
  * All hashes are Spark built-ins (`xxhash64`, `hash`) — engine-deterministic
  * but not cross-engine, so these carry ScalaTest specs instead of DuckDB
  * oracle SQL (the exact + n-gram Jaccard relatives in
  * graft.queries.TextQueries are the oracle-checked forms).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical content. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    docs
      .withColumn("content_hash", xxhash64(col(textCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Word k-shingles as one array column (distinct). */
  def shingles(textCol: Column, k: Int = 3): Column = {
    val words = split(textCol, " ")
    // sliding window over word positions via transform on an index sequence
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(words) - k, lit(0))),
          i => when(size(words) >= k, concat_ws(" ", slice(words, i + 1, lit(k))))),
        s => s.isNotNull))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the doc's shingles. Returned as `minhash` ARRAY<BIGINT>.
    * Seeded universal family: xxhash64(shingle, seed_i).
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      shingleK: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol), explode(shingles(col(textCol), shingleK)).as("sh"))
    // one row per (doc, shingle) → agg min per seed: map-side combinable,
    // single shuffle on doc id.
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    sh.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("minhash"))
  }

  /** LSH banding over minhash signatures → candidate near-dup pairs with
    * their estimated Jaccard (fraction of agreeing minhashes).
    * bands×rowsPerBand must equal the signature length.
    */
  def minhashCandidates(
      sigs: DataFrame,
      idCol: String = "doc_id",
      bands: Int = 8,
      rowsPerBand: Int = 4): DataFrame = {
    val banded = sigs.select(
      col(idCol),
      col("minhash"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand))), b))
      ).as(Seq("band", "bucket")))
    val a = banded.select(col(idCol).as("id_a"), col("minhash").as("mh_a"),
      col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("minhash").as("mh_b"),
      col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("mh_a"), col("mh_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("mh_a"), col("mh_b"), (x, y) => x === y),
          bool => bool)).cast("double") / size(col("mh_a"))).as("est_jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: docs → pairs ≥ threshold. */
  def minhashNearDups(
      docs: DataFrame,
      threshold: Double = 0.7,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numHashes)
    minhashCandidates(sigs, idCol, bands, numHashes / bands)
      .filter(col("est_jaccard") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash over word tokens: bit j of the fingerprint is the sign
    * of Σ_tokens (±1 according to bit j of xxhash64(token)).
    * Long-form impl: explode tokens once, aggregate 64 signed sums in one
    * pass (single shuffle on doc id), rebuild the fingerprint bits.
    */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    toks.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup candidates within Hamming distance `maxHamming`,
    * using 4×16-bit block LSH (pigeonhole: dist ≤ 3 ⇒ one block equal).
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = simhash(docs, idCol, textCol)
    val blocks = fp.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("block", "bval")))
    val a = blocks.select(col(idCol).as("id_a"), col("simhash").as("fp_a"),
      col("block"), col("bval"))
    val b = blocks.select(col(idCol).as("id_b"), col("simhash").as("fp_b"),
      col("block"), col("bval"))
    a.join(b, Seq("block", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b")).distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
