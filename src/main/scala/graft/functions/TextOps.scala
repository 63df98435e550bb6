package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-pipeline surface (north star;
  * SURVEY.md §7.2 step 5): language-ID heuristic, quality scoring, token
  * counting, rolling-hash fingerprinting. Everything except langId and
  * winnowed fingerprints is pure Column expressions (codegen'd, pushdown-
  * friendly); the two UDFs are single-pass per row.
  */
object TextOps {

  /** Function-word profiles for the n-gram/stopword language heuristic.
    * Deliberately tiny — the operator contract is "deterministic heuristic
    * score", not a trained model.
    */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Set("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"))

  /** Unicode NFC normalization as a native codegen expression
    * ([[graft.expressions.NfcNormalize]]) — the canonicalization every
    * text-dedup stage needs before hashing: decomposed and precomposed
    * spellings are different byte strings until normalized, so exact
    * dedup, shingles, and fingerprints silently miss such duplicates.
    * Also registered in SQL as `graft_nfc`.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.NfcNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Language-ID heuristic: CJK character ratio → zh; otherwise the profile
    * with the highest stopword hit rate; "und" (undetermined) when nothing
    * scores. One pass per row.
    */
  def langId(text: Column): Column = {
    val f = udf { (t: String) =>
      if (t == null || t.isEmpty) "und"
      else {
        val cjk = t.codePoints().filter(cp =>
          (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)).count()
        if (cjk * 5 >= t.length) "zh"
        else {
          val toks = t.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
          if (toks.isEmpty) "und"
          else {
            val scores = profiles.view.mapValues(p => toks.count(p.contains)).toMap
            val (best, hits) = scores.maxBy { case (l, n) => (n, l) }
            if (hits == 0) "und" else best
          }
        }
      }
    }
    f(text)
  }

  /** ALL word n-gram occurrences in order (NOT distinct — the counting twin
    * of [[graft.operators.Dedup.shingles]], whose distinct set cannot feed
    * frequency signals). Split let-bound through a single-element transform
    * (the lambda-CSE rule — an inlined split re-evaluates per index).
    */
  def ngrams(text: Column, n: Int): Column =
    transform(array(split(text, " ")), words =>
      filter(
        transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
          i => when(size(words) >= n, concat_ws(" ", slice(words, i + 1, lit(n))))),
        g => g.isNotNull)).getItem(0)

  /** Bigram duplication fraction ∈ [0,1]: 1 − |distinct bigrams| / |bigrams|
    * over the space-split words; ≤1-word documents score 0. The repeated-
    * phrase signal the C4/Gopher-style curation gates threshold (batch
    * pipeline, per-source report, and streaming twin all share this exact
    * column expression — their rule outcomes must never drift apart).
    */
  def bigramDupFraction(text: Column): Column =
    // split let-bound through a single-element transform (the
    // Dedup.shingles pattern): Catalyst re-evaluates an inlined split
    // inside every per-index lambda element — O(words²) chars per row
    transform(array(split(text, " ")), words => {
      val grams = filter(
        transform(sequence(lit(0), greatest(size(words) - 2, lit(0))),
          i => when(size(words) >= 2, concat_ws(" ", slice(words, i + 1, lit(2))))),
        g => g.isNotNull)
      when(size(words) <= 1, lit(0.0))
        .otherwise(lit(1.0) - size(array_distinct(grams)).cast("double") /
          (size(words) - 1).cast("double"))
    }).getItem(0)

  /** Quality score ∈ [0,1]: composite of length band, alphabetic ratio,
    * mean word length band, and repetition penalty — the shape of the
    * heuristics used to filter web scrapes for training corpora. Pure
    * column arithmetic, so it runs inside whole-stage codegen.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val words = split(text, "\\s+")
    val nWords = size(words).cast("double")
    val alphaChars = length(regexp_replace(text, "[^\\p{L} ]", "")).cast("double")
    val lengthScore = least(nChars / lit(200.0), lit(1.0))
    val alphaScore = alphaChars / greatest(nChars, lit(1.0))
    val meanWordLen = nChars / greatest(nWords, lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    val distinctRatio = size(array_distinct(words)).cast("double") / greatest(nWords, lit(1.0))
    (lengthScore * 0.3 + alphaScore * 0.3 + wordLenScore * 0.2 + distinctRatio * 0.2)
      .as("quality")
  }

  /** BPE-ish token estimate: alphabetic runs, digit runs, and single
    * non-space symbols each count as one token — the standard cheap proxy
    * for subword tokenizer counts. Expression form (regexp_extract_all) so
    * the same regex runs in the DuckDB oracle.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Gopher/C4-style quality-rule flags (Rae et al. 2021 §A1.1, Raffel et
    * al. 2020 §2.2 — the published web-scrape filter heuristics, with
    * thresholds scaled to this corpus's short synthetic documents). Returns
    * a struct of per-rule booleans plus the conjunction `keep`; every rule
    * is pure Column arithmetic over exact integer counts, so the pack is
    * codegen'd, pushdown-friendly, and cross-engine oracle-able.
    */
  def gopherRules(text: Column,
      minWords: Int = 10, maxWords: Int = 1000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Int = 2): Column = {
    val words = split(text, " ")
    val nWords = size(words).cast("long")
    // mean word length from exact integer counts (chars-without-spaces /
    // words) — division in double of exact longs, deterministic cross-engine
    val nChars = (length(text) - (nWords - lit(1L))).cast("double")
    val meanLen = nChars / nWords.cast("double")
    val symbolWords = size(filter(words, w => w.rlike("[#_{}]"))).cast("long")
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(filter(words,
      w => w.isin("the", "and", "of", "to", "a", "in", "that", "for"))).cast("long")
    val wordCountOk = nWords.between(minWords, maxWords)
    val meanLenOk = meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen
    val symbolOk = symbolWords.cast("double") <= nWords.cast("double") * maxSymbolRatio
    val alphaOk = alphaWords.cast("double") >= nWords.cast("double") * minAlphaWordRatio
    val stopOk = stopHits >= minStopwordHits
    struct(
      nWords.as("n_words"),
      wordCountOk.as("word_count_ok"),
      meanLenOk.as("mean_word_len_ok"),
      symbolOk.as("symbol_ratio_ok"),
      alphaOk.as("alpha_ratio_ok"),
      stopOk.as("stopword_ok"),
      (wordCountOk && meanLenOk && symbolOk && alphaOk && stopOk).as("keep"))
  }

  /** PII redaction: emails, IPv4 addresses, and long digit runs (phone/ID
    * shapes) replaced with typed placeholder tags. Patterns are restricted
    * to the regex subset with identical semantics in Java regex and RE2, so
    * the same strings drive the DuckDB oracle. Chained regexp_replace =
    * three codegen'd passes, no UDF.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val ipv4Pattern = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val digitRunPattern = "[0-9]{7,}"
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      digitRunPattern, "<NUM>")

  /** Winnowed rolling-hash fingerprint (Rabin-Karp over chars, window
    * minimum selection): robust to insertion/shift, standard for
    * plagiarism/near-dup document fingerprinting. Returns the sorted
    * distinct selected hashes.
    */
  def fingerprints(text: Column, k: Int = 8, window: Int = 4): Column = {
    val f = udf { (t: String) =>
      if (t == null || t.length < k) Array.empty[Long]
      else {
        val B = 1000000007L
        var h = 0L
        var pow = 1L
        var i = 0
        while (i < k - 1) { pow = pow * B; i += 1 }
        val hashes = new Array[Long](t.length - k + 1)
        i = 0
        while (i < t.length) {
          h = h * B + t.charAt(i)
          if (i >= k) h -= pow * B * t.charAt(i - k)
          if (i >= k - 1) hashes(i - k + 1) = h
          i += 1
        }
        // winnowing: min of each sliding window of hashes
        val sel = scala.collection.mutable.SortedSet.empty[Long]
        i = 0
        while (i + window <= hashes.length) {
          var m = hashes(i)
          var j = i + 1
          while (j < i + window) { if (hashes(j) < m) m = hashes(j); j += 1 }
          sel += m
          i += 1
        }
        sel.toArray
      }
    }
    f(text)
  }
}
