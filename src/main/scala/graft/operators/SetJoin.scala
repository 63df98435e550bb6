package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-threshold set-similarity join with prefix filtering (the
  * PPJoin family: Chaudhuri et al. 2006 SSJoin, Xiao et al. 2011): find
  * all pairs whose TOKEN-SET Jaccard is ≥ t, exactly — the deterministic
  * complement to MinHash (which trades exactness for probe cost; this
  * operator's result is the ground truth MinHash approximates).
  *
  * Prefix-filter principle: order every set by one GLOBAL token order
  * (ascending document frequency — rarest first), and keep only each
  * set's first `n − ceil(n·t/(1+t)) + 1` tokens as its "prefix". Jaccard
  * ≥ t forces an overlap of at least t/(1+t)·(na+nb); each side's suffix
  * holds fewer than t/(1+t)·n_i common tokens, so the two suffixes
  * together cannot absorb the required overlap and some common token must
  * sit in BOTH prefixes (the t/(1+t) bound — NOT the tempting n−ceil(t·n)
  * +1 one-sided prefix, which is provably incomplete for prefix-to-prefix
  * joins). The inverted index over prefix tokens alone therefore
  * generates a complete candidate set — SetJoinSpec pins equality with
  * the naive full-token-index join on real data.
  * Rarest-first ordering makes those index postings the SHORTEST
  * ones: the frequent tokens that would explode a naive token-index join
  * never generate candidates. Candidates are verified with an exact
  * array-intersect count, so the output is exact regardless of how
  * sloppy the filter is; the filter only bounds the work.
  *
  * Scale shape: one explode+distinct pass, one frequency aggregation
  * (vocabulary-sized, broadcast back), per-row sort of each set (local),
  * a prefix-token equi-join (postings bounded by the cap below), and a
  * verify join on the two id keys. The hot-token guard mirrors
  * [[Dedup]]'s hot buckets: a prefix token shared by k docs emits k²
  * candidates, so postings past `maxPostingSize` are dropped — unlike
  * LSH, dropping here can lose RECALL, so the cap is a documented
  * work/completeness dial (the gate query runs uncapped).
  */
object SetJoin {

  /** All (id_a < id_b) pairs with token-set Jaccard ≥ t, exactly.
    * `docs` needs idCol and a textCol whose whitespace tokens define the
    * set. Returns (id_a, id_b, n_common, jaccard).
    *
    * `enumSaltFactor` spreads the posting self-join's OUTPUT skew: the
    * join key is a token, so a corpus with few distinct prefix tokens
    * (low-vocabulary text) concentrates the pair enumeration on a handful
    * of shuffle partitions — and AQE's skew-join split cannot help,
    * because its detector sizes partitions by INPUT bytes and posting
    * rows are tiny; it is the join fan-out that explodes. One side
    * replicates over `R` salts, the other assigns `hash(id) mod R`, the
    * join adds the salt to the key — every (token, a, b) row still
    * appears exactly once (b lands on exactly one salt), so the candidate
    * multiset is unchanged (SetJoinSpec pins naive-join equality), while
    * enumeration work spreads R× wider. Measured on the 30-word-vocab
    * sf0.1 corpus: 143 s → see BASELINE.md scaling table. Salting is
    * OPT-IN (default 1 = unsalted): replicating the build side R× costs
    * R× shuffle volume and join input, a pure loss on corpora whose
    * prefix-token postings are already well distributed — pass R > 1 only
    * when the vocabulary is known-small/skewed (the measured bench corpus
    * sets 16 explicitly).
    */
  def jaccardJoin(docs: DataFrame, t: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxPostingSize: Int = Int.MaxValue,
      enumSaltFactor: Int = 1): DataFrame = {
    require(enumSaltFactor >= 1, "enumSaltFactor must be >= 1")
    require(t > 0.0 && t <= 1.0, "threshold must be in (0, 1]")
    val tok = docs
      .select(col(idCol).as("__id"), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("__f"))
    // per doc: tokens sorted by (global freq asc, token) = rarest first;
    // ties on freq break by token text so the order is total and identical
    // for every doc
    val sorted = tok.join(broadcast(freq), "w")
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("__f"), col("w")))).as("__s"))
      .select(col("__id"),
        transform(col("__s"), _.getField("w")).as("toks"),
        size(col("__s")).as("n"))
    val withPrefix = sorted.withColumn("prefix",
      slice(col("toks"), lit(1),
        (col("n") - ceil(col("n") * lit(t / (1 + t))) + 1).cast("int")))
    // postings carry the set size so the SIZE filter (Jaccard ≥ t implies
    // t·max(na,nb) ≤ min(na,nb), since J ≤ min/max always) prunes at
    // candidate-emission time — before the distinct and before any token
    // array ships to the verify join. Exact: a pair cut here is ≤ the same
    // double t the final Jaccard compare uses, so it could never survive
    // verification.
    val posting = withPrefix
      .select(col("__id"), col("n"), explode(col("prefix")).as("w"))
    val guarded = posting.join(
      posting.groupBy(col("w")).agg(count(lit(1)).as("__ps"))
        .filter(col("__ps") <= maxPostingSize).select(col("w")),
      Seq("w"))
    val salted = guarded.select(col("w"), col("__id"), col("n"),
      explode(sequence(lit(0), lit(enumSaltFactor - 1))).as("__salt"))
    val probes = guarded.select(col("w"), col("__id").as("__id2"),
      col("n").as("__n2"),
      pmod(xxhash64(col("__id")), lit(enumSaltFactor.toLong)).as("__salt"))
    val candidates = salted.join(probes, Seq("w", "__salt"))
      .filter(col("__id") < col("__id2"))
      .filter(col("n") * lit(t) <= col("__n2") &&
        col("__n2") * lit(t) <= col("n"))
      .select(col("__id"), col("__id2")).distinct()
    val a = sorted.select(col("__id"), col("toks").as("__ta"), col("n").as("__na"))
    val b = sorted.select(col("__id").as("__id2"), col("toks").as("__tb"),
      col("n").as("__nb"))
    candidates.join(a, "__id").join(b, "__id2")
      .withColumn("n_common", size(array_intersect(col("__ta"), col("__tb"))))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("__na") + col("__nb") - col("n_common")))
      .filter(col("jaccard") >= t)
      .select(col("__id").as("id_a"), col("__id2").as("id_b"),
        col("n_common").cast("long").as("n_common"), col("jaccard"))
  }
}
