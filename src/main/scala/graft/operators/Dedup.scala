package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

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

  /** Exact dedup: keep the lowest id per identical content. Output schema
    * is exactly the input schema (internal hash/rank columns are dropped).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("__content_hash")).orderBy(col(idCol))
    docs
      .withColumn("__content_hash", xxhash64(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__content_hash")
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

  /** Row-local twin of [[shingles]]: identical distinct k-gram set in
    * first-occurrence order, built in one pass over the split words
    * (DedupSpec pins element-for-element parity on hostile inputs).
    *
    * MEASURED NO WIN on the decontaminate explode paths, so the HOF column
    * stays there: at sf0.1 min-of-2, HOF vs UDF — curation funnel 7.39 vs
    * 7.71–8.20 s, t_curation_by_source 3.15 vs 3.36–4.07 s, gram-set
    * build 2.67 vs 3.06–3.57 s (two UDF runs, spread is host noise; see
    * BASELINE.md round-5 notes). Unlike the minhash case — where the HOF
    * form re-inlined shingle construction into each of 32 hash lambdas and
    * the UDF won 36× — the explode path builds each gram once either way,
    * and the UDF adds a serialization boundary without removing work. Kept
    * (tested) for callers that want row-local gram sets without a Column
    * context.
    */
  private[graft] def shinglesLocal(text: String, k: Int): Array[String] =
    // twin contract on NULL text: the HOF yields EMPTY, not null —
    // greatest(size(null) − k, 0) absorbs the null into 0, sequence(0,0)
    // builds [0], and the null-gram filter drops it (DedupSpec pins this)
    if (text == null) Array.empty
    else {
      val words = text.split(" ", -1)
      if (words.length < k) Array.empty
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + k <= words.length) {
          val sb = new java.lang.StringBuilder(words(i))
          var w = 1
          while (w < k) { sb.append(' ').append(words(i + w)); w += 1 }
          seen.add(sb.toString)
          i += 1
        }
        seen.toArray(new Array[String](seen.size))
      }
    }

  /** [[shinglesLocal]] as a Column (UDF). */
  def shinglesFast(textCol: Column, k: Int = 3): Column = {
    val f = udf((t: String) => shinglesLocal(t, k))
    f(textCol)
  }

  /** Benchmark decontamination (the published eval-overlap filter: GPT-3
    * appendix C, PaLM app. — corpus documents sharing any word n-gram with
    * an evaluation/benchmark set are flagged so they can be held out of
    * training). Returns `corpus` + a `contaminated` boolean.
    *
    * Scale shape: the benchmark side is tiny relative to the corpus, so its
    * distinct n-grams BROADCAST; the corpus side is a map-only explode into
    * a broadcast-hash semi-join — the corpus never shuffles. The flagged-id
    * set (≪ corpus) re-joins by id. Pure DataFrame ops, fully
    * oracle-checkable (unlike the hash-based dedup family).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    decontaminateAgainstGrams(corpus,
      benchmarkGrams(benchmark, n, textCol), n, idCol, textCol)

  /** The benchmark's distinct word n-grams as a one-column (`__gram`)
    * relation — the broadcast side of [[decontaminateAgainstGrams]]. At
    * 100 TB this is a computed-once artifact beside the benchmark set;
    * callers that decontaminate repeatedly against the same benchmark
    * should build it once (see the SessionMemo'd form in EngineQueries)
    * instead of letting each consumer re-derive it.
    */
  def benchmarkGrams(benchmark: DataFrame, n: Int = 3,
      textCol: String = "text"): DataFrame =
    benchmark
      .select(explode(shingles(col(textCol), n)).as("__gram"))
      .distinct()

  /** [[decontaminate]] against a pre-built [[benchmarkGrams]] relation. */
  def decontaminateAgainstGrams(corpus: DataFrame, benchGrams: DataFrame,
      n: Int = 3, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val flagged = corpus
      .select(col(idCol), explode(shingles(col(textCol), n)).as("__gram"))
      .join(broadcast(benchGrams), "__gram")
      .select(col(idCol)).distinct()
      .withColumn("__contaminated", lit(true))
    corpus.join(flagged, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__contaminated"), lit(false)))
      .drop("__contaminated")
  }

  /** Bloom-pruned decontamination — same OUTPUT as [[decontaminate]], built
    * for the regime where the benchmark gram set is too big to broadcast
    * comfortably: a Bloom filter over the benchmark grams costs ~10
    * bits/gram at 1% FPR (vs ~50+ bytes/gram for the exact broadcast set)
    * and prunes the corpus-side gram explode BEFORE anything shuffles —
    * only true hits plus the FPR sliver reach the exact semi-join, which
    * then verifies every candidate, so false positives are filtered and the
    * flag set is exactly [[decontaminate]]'s. Two passes over the benchmark
    * side (count + filter build), both tiny relative to the corpus.
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      fpp: Double = 0.01): DataFrame = {
    val benchGrams = benchmark
      .select(explode(shingles(col(textCol), n)).as("__gram"))
      .distinct()
    val expected = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("__gram", expected, fpp)
    val mightContain = udf((g: String) => bloom.mightContain(g))
    val flagged = corpus
      .select(col(idCol), explode(shingles(col(textCol), n)).as("__gram"))
      .filter(mightContain(col("__gram")))
      .join(benchGrams, "__gram") // exact verify: kills bloom false positives
      .select(col(idCol)).distinct()
      .withColumn("__contaminated", lit(true))
    corpus.join(flagged, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__contaminated"), lit(false)))
      .drop("__contaminated")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the doc's distinct word-k-shingles. Returned as `minhash`
    * ARRAY<BIGINT>.
    *
    * Computed row-local in one UDF pass — no explode, no shuffle: at scale
    * this is a map-only stage instead of shuffling |docs|·|shingles| rows.
    * (Two rejected forms: explode+groupBy-min shuffles ~200 rows/doc; a pure
    * higher-order-function form re-inlines the shingle construction into
    * each of the `numHashes` lambdas after projection collapse — measured
    * 36× slower at sf0.1.) Hash family: 32-bit shingle hash mixed with the
    * seed through a splitmix64 finalizer — deterministic across JVMs.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      shingleK: Int = 3): DataFrame = {
    val mh = udf { (text: String) =>
      val words = text.split(" ", -1)
      if (words.length < shingleK) None
      else {
        val mins = Array.fill(numHashes)(Long.MaxValue)
        val seen = new java.util.HashSet[String]()
        var i = 0
        while (i + shingleK <= words.length) {
          val sb = new StringBuilder(words(i))
          var w = 1
          while (w < shingleK) { sb.append(' ').append(words(i + w)); w += 1 }
          val sh = sb.toString
          if (seen.add(sh)) {
            val base = scala.util.hashing.MurmurHash3.stringHash(sh).toLong
            var j = 0
            while (j < numHashes) {
              var x = base ^ (j.toLong * 0x9E3779B97F4A7C15L)
              x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
              if (x < mins(j)) mins(j) = x
              j += 1
            }
          }
          i += 1
        }
        Some(mins)
      }
    }
    docs.select(col(idCol), mh(col(textCol)).as("minhash"))
      .filter(col("minhash").isNotNull)
  }

  /** LSH banding over minhash signatures → candidate near-dup pairs with
    * their estimated Jaccard (fraction of agreeing minhashes).
    * bands×rowsPerBand must equal the signature length.
    */
  def minhashCandidates(
      sigs: DataFrame,
      idCol: String = "doc_id",
      bands: Int = 8,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    val banded = sigs.select(
      col(idCol),
      col("minhash"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand))), b))
      ).as(Seq("band", "bucket")))
    // hot-bucket guard: a bucket holding k docs emits k² candidate pairs —
    // one degenerate shingle (boilerplate headers, empty-ish docs) would
    // quadratically blow up the join at corpus scale. Buckets past the cap
    // carry near-zero signal anyway (they are the "too common" signatures).
    val pruned = banded.join(
      banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("__bs"))
        .filter(col("__bs") <= maxBucketSize)
        .select(col("band"), col("bucket")),
      Seq("band", "bucket"))
    val a = pruned.select(col(idCol).as("id_a"), col("minhash").as("mh_a"),
      col("band"), col("bucket"))
    val b = pruned.select(col(idCol).as("id_b"), col("minhash").as("mh_b"),
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

  /** Collapse a near-dup pair graph to canonical representatives: each
    * document maps to the minimum doc id in its connected component
    * (transitive closure — a~b, b~c ⇒ {a,b,c} share one keeper).
    *
    * Iterative min-label propagation: each round joins current labels
    * across edges (both directions) and keeps the min; components of
    * diameter d converge in ceil(log2(d)) + 1 rounds of the doubled edge
    * set — here plain propagation with a bounded round count, since dup
    * components are shallow in practice (near-clique blobs, not chains).
    * Each round is one shuffle on doc id; no driver-side graph.
    */
  def canonicalize(pairs: DataFrame, maxRounds: Int = 10,
      driverThreshold: Long = 5000000L): DataFrame = {
    // cache the pair computation ONCE before the bidirectional union —
    // otherwise both union branches re-run the (expensive) candidate
    // pipeline upstream before the cache materializes
    val p = pairs.select(col("id_a"), col("id_b")).cache()

    // the dup-pair graph is orders of magnitude smaller than the corpus
    // (|pairs| ≈ dup-rate × docs); under the threshold, one collect + a
    // driver union-find replaces ~log(diameter) sequential Spark jobs.
    // The distributed loop below remains the path for pathological graphs.
    val nPairs = p.count()
    // id-type-generic ordering, so the driver path emits the SAME schema as
    // the distributed path for long/int/string/… ids (it used to hardcode
    // getLong + re-infer BIGINT); types without a defined order fall through
    // to the distributed loop, which only needs least()/min()
    val idType = p.schema.head.dataType
    val driverOrd: Option[Ordering[Any]] = idType match {
      case org.apache.spark.sql.types.LongType =>
        Some(Ordering.by(_.asInstanceOf[Long]))
      case org.apache.spark.sql.types.IntegerType =>
        Some(Ordering.by(_.asInstanceOf[Int]))
      case org.apache.spark.sql.types.ShortType =>
        Some(Ordering.by(_.asInstanceOf[Short]))
      case org.apache.spark.sql.types.StringType =>
        Some(Ordering.by(_.asInstanceOf[String]))
      case _ => None
    }
    if (nPairs <= driverThreshold && driverOrd.isDefined) {
      implicit val ord: Ordering[Any] = driverOrd.get
      val edgeArr = p.collect().map(r => (r.get(0), r.get(1)))
      p.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edgeArr.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          val (lo, hi) = if (ord.lt(ra, rb)) (ra, rb) else (rb, ra)
          parent(hi) = lo
        }
      }
      val rows: Seq[org.apache.spark.sql.Row] = parent.keys.toSeq.sorted.map { id =>
        val rep = find(id)
        org.apache.spark.sql.Row(id, rep, id == rep)
      }
      val spark = pairs.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", idType, nullable = false),
        org.apache.spark.sql.types.StructField("canonical_id", idType, nullable = false),
        org.apache.spark.sql.types.StructField("keep",
          org.apache.spark.sql.types.BooleanType, nullable = false)))
      return spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
    }
    val edges = p.union(p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .cache()
    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("rep", col("id"))
      .cache()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val propagated = edges
        .join(labels, edges("id_b") === labels("id"))
        .groupBy(col("id_a").as("id"))
        .agg(min(col("rep")).as("nrep"))
      val next = labels.join(propagated, Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
        .cache()
      // one job per round: the convergence probe also materializes `next`
      val changed = next.as("n").join(labels.as("o"), Seq("id"))
        .filter(col("n.rep") =!= col("o.rep")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      round += 1
    }
    p.unpersist()
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("rep").as("canonical_id"),
      (col("id") === col("rep")).as("keep"))
  }

  /** Overflow-safe Knuth multiplicative hash into [0, 2^32): equals
    * (c * 2654435761) mod 2^32 for ANY long input (negative included),
    * computed via a 16-bit limb split so no intermediate exceeds 2^49.
    * The naive `c * 2654435761` silently wraps Spark's Long past
    * |c| ≈ 3.47e9 — the wrapped value still reduces correctly mod 2^32,
    * but DuckDB errors on the same BIGINT overflow, so the naive form is
    * not cross-engine. SQL twin: [[graft.queries.Exact.KNUTH32]].
    */
  def knuth32(c: Column): Column = {
    val m = lit(4294967296L)
    val id32 = pmod(c.cast("long"), m)
    val hi = shiftright(id32, 16) // < 2^16
    val lo = id32.bitwiseAND(lit(65535L))
    pmod(pmod(hi * lit(2654435761L), m) * lit(65536L) + lo * lit(2654435761L), m)
  }

  /** Leakage-safe train/test split: the assignment hashes the duplicate
    * CLUSTER's canonical id, not the row id, so every member of an
    * exact/near-dup cluster lands on the same side — the split discipline
    * that stops test data leaking into training through duplicates (the
    * standard eval-integrity failure published decontamination work warns
    * about). `pairs` is any dup-pair relation (exact-hash pairs for a fully
    * deterministic split, MinHash/LSH candidate pairs for near-dup safety);
    * unpaired documents are their own cluster.
    *
    * Hashing branches on the canonical id's type: integral ids use the
    * overflow-safe [[knuth32]] scheme (deterministic cross-engine — the
    * oracle replays it exactly); string ids use `xxhash64` reduced mod
    * 2^32 (deterministic across Spark runs and versions, but xxHash64
    * with Spark's seed is not replayable in other engines — verify via
    * spec, not SQL oracle). Any other id type fails loudly instead of
    * null-casting every row to neither split.
    *
    * Returns docs + (canonical_id, is_test).
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      testPpm: Long = 100000L, idCol: String = "doc_id"): DataFrame = {
    val canon = canonicalize(pairs)
      .select(col("doc_id").as(idCol), col("canonical_id"))
    val joined = docs.join(canon, Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col(idCol)))
    val bucket = joined.schema("canonical_id").dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        knuth32(col("canonical_id"))
      case StringType => pmod(xxhash64(col("canonical_id")), lit(4294967296L))
      case t => throw new IllegalArgumentException(
        s"leakageSafeSplit: canonical id must be integral or string, got $t")
    }
    joined.withColumn("is_test", bucket < lit(testPpm * 4294967296L / 1000000L))
  }

  /** Incremental dedup of an arriving batch against an existing canonical
    * corpus — the production daily-ingest shape, where the corpus is orders
    * of magnitude larger than the batch and must never self-join or
    * reshuffle per batch:
    *
    *  - exact: content-hash membership probe. The corpus contributes one
    *    map-only hash projection (at scale, a persisted hash-index column
    *    read instead of recomputed);
    *  - near-dup: batch MinHash signatures probe the corpus's banded bucket
    *    table in an ASYMMETRIC equi-join — batch-buckets × corpus-buckets,
    *    with the same hot-bucket cap as the self-join family applied to the
    *    corpus side.
    *
    * Pass `corpusSigs` (a prior `minhashSignatures` output, the persisted
    * artifact) to skip recomputing corpus signatures per batch.
    *
    * Returns the batch with `exact_dup: boolean` and `near_dup_of: nullable
    * id` (lowest corpus id whose estimated Jaccard ≥ threshold).
    */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
      threshold: Double = 0.7, idCol: String = "doc_id",
      textCol: String = "text", numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = 1000,
      corpusSigs: Option[DataFrame] = None): DataFrame = {
    val rowsPerBand = numHashes / bands
    val exactHit = corpus.select(xxhash64(col(textCol)).as("__h")).distinct()
      .withColumn("__exact", lit(true))
    val withExact = batch
      .withColumn("__h", xxhash64(col(textCol)))
      .join(exactHit, Seq("__h"), "left")
      .withColumn("exact_dup", coalesce(col("__exact"), lit(false)))
      .drop("__h", "__exact")

    def banded(sigs: DataFrame, as: String) = sigs.select(
      col(idCol).as(as), col("minhash").as(s"mh_$as"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
        .as(Seq("band", "bucket")))
    val cAll = banded(
      corpusSigs.getOrElse(minhashSignatures(corpus, idCol, textCol, numHashes)),
      "corpus_id")
    // hot-bucket cap on the corpus side only: a degenerate corpus bucket
    // multiplies every probing batch row, the asymmetric form of the k² blowup
    val c = cAll.join(
      cAll.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("__bs"))
        .filter(col("__bs") <= maxBucketSize)
        .select(col("band"), col("bucket")),
      Seq("band", "bucket"))
    val b = banded(minhashSignatures(batch, idCol, textCol, numHashes), "batch_id")
    val nearest = b.join(c, Seq("band", "bucket"))
      .select(col("batch_id"), col("corpus_id"), col("mh_batch_id"), col("mh_corpus_id"))
      .distinct()
      .select(col("batch_id"), col("corpus_id"),
        (size(filter(zip_with(col("mh_batch_id"), col("mh_corpus_id"),
          (x, y) => x === y), bool => bool)).cast("double") /
          size(col("mh_batch_id"))).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("batch_id"))
      .agg(min(col("corpus_id")).as("near_dup_of"))
    withExact.join(nearest, withExact(idCol) === nearest("batch_id"), "left")
      .drop("batch_id")
  }

  /** 64-bit SimHash over word tokens: bit j of the fingerprint is the sign
    * of Σ_tokens (±1 according to bit j of hash(token)). Row-local one-pass
    * UDF — no tokenizer explode, no shuffle (the alternative explode +
    * 64-column groupBy shuffles |docs|·|tokens| rows and re-hashes per bit).
    */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = udf { (text: String) =>
      val counts = new Array[Int](64)
      text.split(" ", -1).foreach { tok =>
        var x = scala.util.hashing.MurmurHash3.stringHash(tok).toLong * 0x9E3779B97F4A7C15L
        x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
        var j = 0
        while (j < 64) {
          if (((x >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      var fp = 0L
      var j = 0
      while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
      fp
    }
    docs.select(col(idCol), sh(col(textCol)).as("simhash"))
  }

  /** SimHash near-dup candidates within Hamming distance `maxHamming`,
    * using 4×16-bit block LSH (pigeonhole: dist ≤ 3 ⇒ one block equal).
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucketSize: Int = 1000): DataFrame = {
    val fp = simhash(docs, idCol, textCol)
    val allBlocks = fp.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("block", "bval")))
    // same hot-bucket guard as minhashCandidates: cap k² pair blowup from
    // one over-common 16-bit block value
    val blocks = allBlocks.join(
      allBlocks.groupBy(col("block"), col("bval"))
        .agg(count(lit(1)).as("__bs"))
        .filter(col("__bs") <= maxBucketSize)
        .select(col("block"), col("bval")),
      Seq("block", "bval"))
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
