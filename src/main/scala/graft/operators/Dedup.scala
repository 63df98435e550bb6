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
  * The MinHash hash family (polynomial code-point hash mod 2^31−1 through
  * affine permutations — [[polyHash31]]/[[permA]]/[[permB]]) is
  * SQL-replayable, so the LSH gate queries carry FULL DuckDB oracles
  * (graft.queries.Exact.MINHASH_PAIRS_CTES). Band buckets still use
  * `xxhash64` as a pure shuffle-key compressor — bucket equality is slice
  * equality, which the oracle joins on directly, so the bucket hash itself
  * never needs cross-engine replay. SimHash remains engine-hash (spec-
  * verified; its 64-bit sign accumulation has no exact SQL twin).
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

  /** Word k-shingles as one array column (distinct).
    *
    * The split is LET-BOUND through a single-element `transform` lambda
    * before the sliding window references it: Catalyst has no common
    * subexpression elimination across nested lambda bodies, so the naive
    * form (`val words = split(...)` inlined into the per-index lambda)
    * re-splits the text once per word position — O(words²) chars per row.
    * Measured at sf0.1 (5k docs, 54 words avg): inlined explode 3.9 s vs
    * 1.2 s let-bound, and the round-5 "HOF vs UDF no win" note is
    * superseded — the let-bound HOF matches the UDF twin's speed while
    * staying whole-stage-codegen.
    */
  def shingles(textCol: Column, k: Int = 3): Column =
    transform(array(split(textCol, " ")), words =>
      array_distinct(
        filter(
          transform(sequence(lit(0), greatest(size(words) - k, lit(0))),
            i => when(size(words) >= k, concat_ws(" ", slice(words, i + 1, lit(k))))),
          s => s.isNotNull))).getItem(0)

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

  /** Prime modulus of the MinHash/CMS hash family: 2^31 − 1 (Mersenne).
    * Every intermediate in the affine scheme stays < 2^62, so the exact
    * same arithmetic runs in Spark longs AND DuckDB BIGINTs — no overflow
    * wrap on either engine. SQL twin: [[graft.queries.Exact.POLYHASH31]].
    */
  private[graft] val HashP = 2147483647L

  /** Polynomial code-point hash of a string mod [[HashP]] — the Java
    * `String.hashCode` recurrence (h·31 + c) reduced mod p each step, but
    * iterated over Unicode CODE POINTS (not UTF-16 units) so DuckDB's
    * `unicode()` per character replays it exactly on supplementary-plane
    * input too. Cross-engine by construction; DedupSpec pins the twin.
    */
  private[graft] def polyHash31(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % HashP
      i += Character.charCount(cp)
    }
    h
  }

  /** Per-permutation affine coefficients a_j ∈ [1, p−1], b_j ∈ [0, p−1],
    * drawn by a splitmix64 finalizer over (j, salt) — each permutation is
    * an INDEPENDENT draw from the universal family h_j(x) = (a_j·x + b_j)
    * mod p. They must NOT be linear in j: a_j = a₁·(j+1) makes every
    * h_j a scalar multiple of h₀, so one shared shingle with a small h₀
    * wins the min in most permutations of both docs and est_jaccard
    * collapses to ~1 (DedupSpec's est-vs-truth test catches exactly this).
    * The coefficients are compile-time constants, so the SQL twin embeds
    * them as a literal 32-row VALUES table rather than replaying splitmix
    * (64-bit overflow arithmetic has no safe SQL form).
    */
  private def splitmix(z0: Long): Long = {
    var x = z0 * 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }
  private[graft] def permA(j: Int): Long =
    1L + java.lang.Long.remainderUnsigned(splitmix(2L * j + 1), HashP - 1)
  private[graft] def permB(j: Int): Long =
    java.lang.Long.remainderUnsigned(splitmix(2L * j + 2), HashP)

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the doc's distinct word-k-shingles. Returned as `minhash`
    * ARRAY<BIGINT>.
    *
    * Computed row-local in one UDF pass — no explode, no shuffle: at scale
    * this is a map-only stage instead of shuffling |docs|·|shingles| rows.
    * (Two rejected forms: explode+groupBy-min shuffles ~200 rows/doc; a pure
    * higher-order-function form re-inlines the shingle construction into
    * each of the `numHashes` lambdas after projection collapse — measured
    * 36× slower at sf0.1.) Hash family: polynomial code-point shingle hash
    * mod 2^31−1 ([[polyHash31]]) through per-permutation affine universal
    * hashes ([[permA]]/[[permB]]) — deterministic across JVMs AND
    * SQL-replayable, so the LSH gate queries carry FULL DuckDB oracles
    * (round-5 verdict item 1; the earlier murmur+splitmix family was
    * JVM-only and capped the whole near-dup family at rows-only checks).
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      shingleK: Int = 3): DataFrame =
    docs.select(col(idCol),
        minhashUdf(numHashes, shingleK)(col(textCol)).as("minhash"))
      .filter(col("minhash").isNotNull)

  /** The signature kernel as a reusable UDF — consumers that must keep
    * their other columns (the streaming TTL near-dup carries its
    * watermarked timestamp) apply it with withColumn instead of the
    * projecting [[minhashSignatures]] form.
    */
  private[graft] def minhashUdf(numHashes: Int, shingleK: Int) = {
    val as = Array.tabulate(numHashes)(permA)
    val bs = Array.tabulate(numHashes)(permB)
    udf { (text: String) =>
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
            val base = polyHash31(sh)
            var j = 0
            while (j < numHashes) {
              val x = (as(j) * base + bs(j)) % HashP
              if (x < mins(j)) mins(j) = x
              j += 1
            }
          }
          i += 1
        }
        Some(mins)
      }
    }
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
    * Distributed path: alternating large-star / small-star contraction
    * (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond").
    * Each alternation rewires every node's neighbors to its neighborhood
    * minimum, so path-shaped components collapse in O(log^2 n) alternations
    * regardless of diameter — plain min-label propagation (the previous
    * form) needs O(diameter) rounds and a single 10k-long near-dup chain
    * (consecutive crawl snapshots) would exhaust any bounded round count.
    * Each alternation is two key shuffles over the current edge set, and
    * the edge set only shrinks (toward one star per component); no
    * driver-side graph.
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
    // Large-star over a symmetric neighbor view: every neighbor u of v with
    // u > v is rewired to m = min(N(v) ∪ {v}). Output edges all satisfy
    // src > dst (u > v ≥ m), so the canonical hi→lo orientation is free.
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = nbrs.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      nbrs.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // Small-star on the hi→lo orientation: all of v's smaller neighbors (and
    // v itself) are rewired to the smallest of them. dst ≥ m by minimality,
    // so orientation is again preserved after dropping self-loops.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("src").agg(min("dst").as("m"))
      e.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // Each alternation references `e` several times (symmetric union + two
    // joins), so the logical plan grows geometrically round over round —
    // caching alone does NOT truncate lineage and the planner chokes after
    // a few rounds. Truncate per round: a reliable checkpoint when the
    // session has a checkpoint dir (cluster path — survives executor loss),
    // else an eager localCheckpoint (executor-resident, fine for local and
    // short chains of rounds). Superseded round RDDs are dropped by the
    // ContextCleaner once unreferenced.
    def truncated(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    var e = truncated {
      val sym = p.filter(col("id_a") =!= col("id_b"))
      sym.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(sym.select(col("id_b").as("src"), col("id_a").as("dst")))
        .filter(col("src") > col("dst"))
        .distinct()
    }
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = truncated(smallStar(largeStar(e)))
      // at the fixpoint the edge set is exactly one star per component, and
      // both steps are identity on stars — set equality detects it (the
      // checkpoint already materialized `next`).
      converged = next.count() == e.count() &&
        next.except(e).limit(1).count() == 0
      e = next
      round += 1
    }
    // every node is a src of its star edge except component roots (and
    // self-pair-only docs); the left join gives those rep = self.
    val nodes = p.select(col("id_a").as("id"))
      .union(p.select(col("id_b").as("id"))).distinct()
    val reps = e.groupBy(col("src").as("id")).agg(min("dst").as("rep"))
    var labels = nodes.join(reps, Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
    if (!converged) {
      // the star loop exhausted maxRounds before reaching its fixpoint:
      // labels may contain rep CHAINS (a canonical_id that is itself
      // non-canonical), which would silently split components. Flatten by
      // pointer jumping — each pass halves the longest chain, so the
      // bounded loop resolves chains up to 2^maxRounds links.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"canonicalize: star contraction hit maxRounds=$maxRounds without " +
          "converging; flattening rep chains by pointer jumping")
      var changed = true
      var fr = 0
      val flattenRounds = math.max(maxRounds, 16) // 2^16 links is any real chain
      while (changed && fr < flattenRounds) {
        val chased = labels.as("a")
          .join(labels.select(col("id").as("__rid"), col("rep").as("__rrep")),
            col("a.rep") === col("__rid"), "left")
          .select(col("a.id").as("id"),
            coalesce(col("__rrep"), col("a.rep")).as("rep"))
          .localCheckpoint(true)
        changed = chased.as("x")
          .join(labels.select(col("id").as("__yid"), col("rep").as("__yrep")),
            col("x.id") === col("__yid"))
          .filter(col("x.rep") =!= col("__yrep")).limit(1).count() > 0
        labels = chased
        fr += 1
      }
    }
    val out = labels.select(col("id").as("doc_id"), col("rep").as("canonical_id"),
      (col("id") === col("rep")).as("keep"))
    // materialize before dropping the pair cache the `nodes` side depends on
    val frozen = out.cache()
    frozen.count()
    p.unpersist()
    frozen
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

  /** K-fold generalization of [[leakageSafeSplit]]: assign every document
    * to one of `k` cross-validation folds such that all members of a
    * duplicate cluster land in the SAME fold (fold = canonical id's hash
    * bucket scaled by k — a held-out fold never sees a near-copy of a
    * training document). The scale shape is the split's: one canonical
    * join, then map-only arithmetic. The double product k·bucket < 2^37
    * is exact in IEEE, so fold boundaries are deterministic cross-engine.
    */
  def leakageSafeFolds(docs: DataFrame, pairs: DataFrame, k: Int = 5,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    val canon = canonicalize(pairs)
      .select(col("doc_id").as(idCol), col("canonical_id"))
    val joined = docs.join(canon, Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col(idCol)))
    val bucket = joined.schema("canonical_id").dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        knuth32(col("canonical_id"))
      case StringType => pmod(xxhash64(col("canonical_id")), lit(4294967296L))
      case t => throw new IllegalArgumentException(
        s"leakageSafeFolds: canonical id must be integral or string, got $t")
    }
    joined.withColumn("fold",
      floor(bucket * lit(k.toLong) / lit(4294967296.0)).cast("int"))
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
    *
    * Token hash = [[polyHash31]] base widened through a two-round
    * multiply-xor avalanche. Every step is SQL-replayable (the wrapping
    * 64-bit multiplies are mod-2^64 in DuckDB HUGEINT arithmetic, `>>>`
    * is unsigned floor division), so the near-dup gate carries a FULL
    * oracle; the avalanche restores the high-bit diffusion a bare
    * polynomial hash lacks (DedupSpec's hamming-separation tests pin it).
    */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = udf { (text: String) =>
      val counts = new Array[Int](64)
      text.split(" ", -1).foreach { tok =>
        var x = polyHash31(tok) * 0x9E3779B97F4A7C15L
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

  /** Span-level exact dedup, the C4 "three-sentence span" / RefinedWeb
    * line-dedup family: cut each document into fixed `segTokens`-token
    * spans, keep only the FIRST corpus-wide occurrence of each distinct
    * span (lexicographically smallest (doc id, span index)), and rebuild
    * every document from its surviving spans. Removes boilerplate
    * (headers, license blocks, navigation chrome) that repeats across
    * crawled pages without dropping whole documents.
    *
    * Output: one row per doc — (idCol, n_segs, n_kept, clean_text).
    * A fully-duplicated document survives with clean_text = "" so the
    * caller decides whether to drop empties.
    *
    * 100 TB shape: span construction is map-only HOF arithmetic (no
    * explode until spans exist, one row per span after); first-occurrence
    * resolution is two span-keyed aggregations plus one span-keyed join —
    * all partition on the span hash, no windows, no skew beyond genuinely
    * viral spans (bounded: a span seen k times contributes k join rows,
    * not k²). Reconstruction is one groupBy on doc id.
    */
  def spanDedup(docs: DataFrame, segTokens: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // split let-bound through a single-element transform (the
    // Dedup.shingles pattern) so the per-segment lambda slices a
    // materialized array instead of re-splitting the text per segment
    val segArray = transform(array(split(col(textCol), " ")), toks => {
      val nseg = ceil(size(toks).cast("double") / segTokens).cast("int")
      // split('') yields [''], so nseg >= 1 always and sequence() is safe
      transform(sequence(lit(0), nseg - 1), i =>
        array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " "))
    }).getItem(0)
    val segs = docs
      .select(col(idCol), segArray.as("sg"))
      .select(col(idCol), posexplode(col("sg")).as(Seq("seg_idx", "seg")))
    val firstDoc = segs.groupBy(col("seg")).agg(min(col(idCol)).as("kdoc"))
    val firstOcc = segs.as("s")
      .join(firstDoc.as("f"),
        col("s.seg") === col("f.seg") && col(s"s.$idCol") === col("f.kdoc"))
      .groupBy(col("s.seg").as("kseg"), col("f.kdoc"))
      .agg(min(col("s.seg_idx")).as("kidx"))
    segs.as("s")
      .join(firstOcc.as("k"),
        col("s.seg") === col("k.kseg") && col(s"s.$idCol") === col("k.kdoc") &&
          col("s.seg_idx") === col("k.kidx"),
        "left")
      .select(col(s"s.$idCol").as(idCol), col("s.seg_idx").as("seg_idx"),
        col("s.seg").as("seg"), col("k.kseg").isNotNull.as("keep"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("seg_idx"), col("seg"))))),
            _.getField("seg")),
          " ").as("clean_text"))
  }
}
