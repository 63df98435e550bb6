package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-threshold edit-distance (Levenshtein) similarity join with
  * q-gram prefix filtering — the Ed-Join family (Gravano et al. 2001
  * approximate string joins; Xiao, Wang & Lin 2008 Ed-Join): find all
  * pairs with `levenshtein(a, b) <= tau`, exactly, without the n² cross
  * join. The string-typo complement to [[SetJoin]]'s token-set Jaccard:
  * SetJoin catches reordered/overlapping token sets, this catches
  * character-level corruption (OCR noise, key smashes, serial-number
  * drift) — the record-linkage half of a dedup stack.
  *
  * Filter chain (every stage exact-complete; only the work shrinks):
  *
  *  1. '''q-gram count filter.''' Each string is padded with q−1 sentinel
  *     chars on both ends and cut into its DISTINCT q-grams. One edit
  *     (sub/ins/del) touches at most q grams, so `ed(a,b) <= tau` forces
  *     `|G_a \ G_b| <= q·tau`.
  *  2. '''Prefix filter.''' Order all grams by one global total order
  *     (document frequency ascending, ties by gram text — rarest first)
  *     and keep each string's first `q·tau + 1` grams as its prefix. If
  *     the pair is within tau, some shared gram sits in BOTH prefixes:
  *     WLOG let a's prefix max be <= b's prefix max under the global
  *     order; a's q·tau+1 prefix grams cannot all be missing from G_b
  *     (count filter), and a shared gram g <= max(prefix_a) <=
  *     max(prefix_b) must lie inside b's smallest-(q·tau+1) set, i.e.
  *     b's prefix. The inverted index over prefix grams alone is
  *     therefore a complete candidate generator (EdJoinSpec pins
  *     equality with the naive cross join).
  *  3. '''Length filter.''' `|len(a) − len(b)| <= tau` — each edit
  *     changes length by at most one.
  *  4. '''Verify.''' Real `levenshtein` on the surviving candidates; the
  *     output is exact regardless of filter sloppiness.
  *
  * Scale shape (mirrors [[SetJoin.jaccardJoin]]): one explode+distinct
  * pass, one vocabulary-sized frequency agg broadcast back, a per-row
  * local sort, a prefix-gram equi-join whose postings are the SHORTEST
  * ones (rarest-first), and a verify join on the two id keys — never an
  * n² cross product (PlanSpec pins no CartesianProduct). A gram shared
  * by k strings emits k² candidates, so `maxPostingSize` caps hot
  * postings as a documented work/completeness dial exactly like
  * SetJoin's (the gate query runs uncapped).
  *
  * Reference context: the reference dedups image paths by exact name
  * only (/root/reference/src/extract_embedding.py:61-69); this is the
  * fuzzy-key generalization a 100 TB catalog needs.
  */
object EdJoin {

  /** Boundary sentinel (U+0001), assumed absent from the data — document
    * text never carries C0 controls (HostileInputSpec keeps the
    * degenerate cases honest). Padding makes even strings shorter than q
    * contribute grams, so no row silently drops out of the candidate
    * chain (two 1-char strings at distance 1 must still pair up).
    */
  private val Pad = "\u0001"

  /** DISTINCT padded q-grams of `s` as an array column. A string of
    * length L yields L + q − 1 grams (≥ q − 1 even for the empty
    * string, so no row drops out of the filter chain).
    */
  private def grams(s: Column, q: Int): Column = {
    val padded = concat(lit(Pad * (q - 1)), s, lit(Pad * (q - 1)))
    array_distinct(transform(
      sequence(lit(1), length(padded) - (q - 1)),
      i => padded.substr(i, lit(q))))
  }

  /** Single-deletion neighborhood keys of `s`, hashed to longs: the
    * string itself plus every length−1 variant. Two strings within
    * Levenshtein 1 ALWAYS share a key (the symmetric-delete argument,
    * as in SymSpell-style spelling indexes):
    *
    *  - `ed = 0`: both post the full string.
    *  - substitution at position i: deleting position i from either side
    *    yields the same length−1 string.
    *  - insertion/deletion (WLOG `b` = `a` with one char inserted at i):
    *    `b` deleting position i yields `a`, which `a` posts verbatim.
    *
    * Keys are `xxhash64` of the variants — a hash collision can only ADD
    * a candidate (verify discards it), never lose a true pair. Postings
    * under these keys are bounded by the TRUE near-dup cluster sizes
    * (plus vanishing hash collisions), not by gram vocabulary — the
    * property the q-gram path loses on fixed-format serial keys, where
    * the ~10²-gram digit alphabet saturates and postings grow linearly
    * with the corpus (measured: scaling exponent 2.04 on 15k → 150k
    * TPC-H customer names before this path, ~linear after; BASELINE.md
    * scaling table).
    */
  private[graft] def deletionKeys(s: Column): Column = {
    val variants = transform(
      sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    transform(array_union(array(s), variants), v => xxhash64(v))
  }

  /** Driver-side twin of [[deletionKeys]]: the SAME variants (string +
    * each single-CODE-POINT deletion, deduplicated like `array_union`)
    * hashed with the SAME `xxhash64` (Spark's XxHash64 over the UTF-8
    * bytes, seed 42) — so a probe can derive its query keys and their
    * buckets locally, with ZERO Spark jobs, and they land in exactly the
    * partitions the Column form wrote (EdJoinSpec pins the parity,
    * including non-ASCII and supplementary code points: Spark's substr
    * counts code points, so the mirror must too — a UTF-16 code-unit
    * deletion would split an emoji and hash differently).
    */
  private[graft] def deletionKeyHashes(s: String): Seq[Long] = {
    val cps = s.codePoints.toArray
    val variants = s +: cps.indices.map { i =>
      val sb = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < cps.length) {
        if (j != i) sb.appendCodePoint(cps(j))
        j += 1
      }
      sb.toString
    }
    variants.distinct.map(v =>
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType, 42L))
  }

  /** All (id_a < id_b) pairs with `levenshtein <= tau`, exactly.
    * Returns (id_a, id_b, dist).
    *
    * Routing: `tau == 1` (the record-linkage/typo case) uses
    * [[deletionKeys]] blocking — candidate volume proportional to the
    * output, immune to gram-vocabulary saturation; `tau != 1` uses the
    * q-gram count+prefix+length chain below (deletion neighborhoods grow
    * C(len, tau)-fold and stop paying for themselves at tau ≥ 2).
    */
  def edJoin(df: DataFrame, tau: Int,
      idCol: String = "id", strCol: String = "s", q: Int = 2,
      maxPostingSize: Int = Int.MaxValue): DataFrame = {
    require(tau >= 0, "tau must be >= 0")
    require(q >= 1, "q must be >= 1")
    // the id is cast to long for the __id < __id2 candidate predicate; a
    // non-numeric id would cast to NULL, fail every comparison, and the
    // join would silently return zero pairs — fail loudly instead
    df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case t => throw new IllegalArgumentException(
        s"edJoin: id column '$idCol' must be numeric (got $t) — non-numeric " +
          "ids cast to NULL and silently empty the join; add a surrogate " +
          "key (e.g. monotonically_increasing_id or a rank) first")
    }
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(strCol).as("__s"))
    // exact verify on candidate id pairs — shared by both candidate
    // generators; output exactness never depends on the blocking scheme
    def verify(candidates: DataFrame): DataFrame = {
      val a = base.select(col("__id"), col("__s").as("__sa"))
      val b = base.select(col("__id").as("__id2"), col("__s").as("__sb"))
      candidates.join(a, "__id").join(b, "__id2")
        .filter(abs(length(col("__sa")) - length(col("__sb"))) <= tau)
        .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
        .filter(col("dist") <= tau)
        .select(col("__id").as("id_a"), col("__id2").as("id_b"),
          col("dist").cast("long").as("dist"))
    }
    if (tau == 1) {
      val posting = base
        .select(col("__id"), explode(deletionKeys(col("__s"))).as("g"))
      val guarded =
        if (maxPostingSize == Int.MaxValue) posting
        else posting.join(
          posting.groupBy(col("g")).agg(count(lit(1)).as("__ps"))
            .filter(col("__ps") <= maxPostingSize).select(col("g")),
          Seq("g"))
      return verify(guarded.join(
          guarded.select(col("g"), col("__id").as("__id2")), Seq("g"))
        .filter(col("__id") < col("__id2"))
        .select(col("__id"), col("__id2")).distinct())
    }
    val tok = base
      .select(col("__id"), explode(grams(col("__s"), q)).as("g"))
    val freq = tok.groupBy(col("g")).agg(count(lit(1)).as("__f"))
    // rarest-first total order: (global freq asc, gram text) — identical
    // for every string, which the prefix-to-prefix argument requires
    val sorted = tok.join(broadcast(freq), "g")
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("__f"), col("g")))).as("__gs"))
      .select(col("__id"),
        slice(transform(col("__gs"), _.getField("g")),
          1, q * tau + 1).as("prefix"))
    // Short-string bucket: a string with ≤ q·tau grams (length ≤
    // q·(tau−1)+1) can be within tau of a string sharing NO gram at all
    // ("a" vs "b" at q=2, tau=1), so the prefix argument needs a
    // nonempty forced intersection it doesn't have. Complete fix: every
    // string short enough to pass the LENGTH filter against such a
    // string (length ≤ q·(tau−1)+1+tau) posts under one reserved
    // bucket, enumerated all-pairs and verified like any candidate. Real
    // corpora hold vanishingly few ≤3-char keys; an adversarial pile of
    // them hits the same posting-cap dial as any hot gram. The bucket
    // key is q+1 sentinels — real grams are exactly q chars, so no
    // collision.
    val shortBucket = base
      .filter(length(col("__s")) <= q * (tau - 1) + 1 + tau)
      .select(col("__id"), lit(Pad * (q + 1)).as("g"))
    val posting = sorted.select(col("__id"), explode(col("prefix")).as("g"))
      .union(shortBucket)
    // the hot-posting guard costs an extra agg+join pass — only pay it
    // when a cap is actually set (the gate query runs uncapped)
    val guarded =
      if (maxPostingSize == Int.MaxValue) posting
      else posting.join(
        posting.groupBy(col("g")).agg(count(lit(1)).as("__ps"))
          .filter(col("__ps") <= maxPostingSize).select(col("g")),
        Seq("g"))
    verify(guarded.join(
        guarded.select(col("g"), col("__id").as("__id2")), Seq("g"))
      .filter(col("__id") < col("__id2"))
      .select(col("__id"), col("__id2")).distinct())
  }
}
