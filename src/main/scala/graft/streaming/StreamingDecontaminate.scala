package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time span-level decontamination — the streaming twin of
  * [[graft.operators.DupSpans.contaminatedSpans]] + `scrubWith`: every
  * arriving document is scrubbed of text that verbatim-duplicates a FROZEN
  * benchmark gram artifact, entirely row-locally. The gram set broadcasts
  * once; there is no state and no shuffle, so the same transform runs
  * identically over a firehose micro-batch or a batch table — the
  * strongest batch-parity contract in the streaming family (the batch mode
  * IS the semantics, no ordered-arrival caveat needed).
  *
  * DupSpansSpec pins the row-local scrub ≡ the relational
  * `scrubWith(corpus, contaminatedSpans(corpus, bench))` composition
  * row-for-row; StreamingSpec pins multi-batch parity through a
  * MemoryStream. At 100 TB the artifact is the published decontamination
  * shape: benchmark n-gram sets are MBs against a corpus of TBs.
  */
object StreamingDecontaminate {

  /** Scrub `docs` (static OR streaming) against `benchGrams` (a bounded
    * one-column `gram` relation — collected and broadcast). Output per doc:
    * `doc_id, source, text (scrubbed), n_tokens_before, n_tokens_removed`.
    */
  def scrubStream(docs: DataFrame, benchGrams: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"window length must be >= 2 tokens, got $k")
    val spark = docs.sparkSession
    val grams = benchGrams.select(col("gram"))
      .collect().map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(grams)
    val scrub = udf { (text: String) =>
      if (text == null) ("", 0L, 0L)
      else {
        val toks = text.split(" ", -1)
        val covered = new Array[Boolean](toks.length)
        var p = 0
        while (p + k <= toks.length) {
          if (bc.value.contains(toks.slice(p, p + k).mkString(" "))) {
            var i = p
            while (i < p + k) { covered(i) = true; i += 1 }
          }
          p += 1
        }
        val kept = toks.indices.collect { case i if !covered(i) => toks(i) }
        (kept.mkString(" "), toks.length.toLong,
          (toks.length - kept.length).toLong)
      }
    }
    docs
      .withColumn("__s", scrub(col("text")))
      .select(col("doc_id"), col("source"),
        col("__s._1").as("text"),
        col("__s._2").as("n_tokens_before"),
        col("__s._3").as("n_tokens_removed"))
  }
}
