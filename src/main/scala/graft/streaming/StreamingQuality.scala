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
  * `tx_stream_quality_flags` gate a FULL oracle — the weights ship as
  * shortest-roundtrip literals into the DuckDB replay (the ndcgWeights
  * identical-literals discipline), so both engines fold the SAME doubles
  * in the SAME token order and the sign readout is exact with no margin
  * argument needed.
  *
  * 100 TB shape: the weight map is kilobytes and rides the closure; the
  * stream maps — cost ∝ tokens scanned, zero state growth.
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
