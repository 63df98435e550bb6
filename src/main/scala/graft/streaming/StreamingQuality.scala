package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time MODEL-BASED quality filtering — the classifier sibling of
  * [[StreamingCuration]]'s rule filter, closing the loop on the
  * `t_quality_classifier_select` training gate: the trained linear
  * model's per-term weights are a frozen bounded artifact (vocabulary ×
  * one double), and scoring is [[graft.operators.BowEmbed.scoreColumn]]
  * — a row-local left fold over the text's tokens. Entirely STATELESS:
  * no watermark, no GroupState, no shuffle; batch mode IS the semantics
  * (the [[StreamingDecontaminate]] recipe), which makes the
  * `tx_stream_quality_flags` gate a FULL oracle — DuckDB replays the
  * TRAINING (the shared CG chain), derives the same term→weight map
  * relationally, and folds left-to-right in the same token order, with
  * the sign readout as the checked boundary (the
  * vx_linear_probe_quantized convention: CG-solved doubles can differ
  * at ulp level across engines, and sign is the readout that has held
  * at both SFs across rounds; a literal-shipped weight table would
  * remove even that — at the cost of no longer checking the training).
  *
  * 100 TB shape: the weight map is VOCABULARY-bounded and rides the
  * closure — right for bounded vocabularies (this corpus, any hashed-
  * bucket model); an open web-scale vocabulary should score via a
  * broadcast-join against the weight relation (the [[graft.operators
  * .BowEmbed.embed]] plan) rather than a plan literal. The stream side
  * maps — cost ∝ tokens scanned, zero state growth.
  */
object StreamingQuality {

  /** Score each document row-locally and flag `pred_keep = score >
    * threshold`. Works identically on a streaming or batch `docs`
    * relation; appends (`quality_score`, `pred_keep`).
    */
  def scoreFlags(docs: DataFrame, weightsByTerm: Map[String, Double],
      threshold: Double = 0.0, textCol: String = "text"): DataFrame = {
    val s = graft.operators.BowEmbed.scoreColumn(weightsByTerm, col(textCol))
    docs.withColumn("quality_score", s)
      .withColumn("pred_keep", col("quality_score") > lit(threshold))
  }
}
