package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-inspection aid: prints the formatted physical plan for the named
  * queries (or a default headline set) so scan pushdown / broadcast choice /
  * shuffle count can be reviewed per SURVEY.md §4.3. Not part of the driver
  * contract — local tooling.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("p6_filter_project", "j1_region_customer_rollup",
        "j2_top_orders_by_revenue", "a2_pricing_summary",
        "v_centroid_cosine_matrix", "vx_fast_centroid_cosine",
        "j_range_ship_within_30d", "tx_dedup_minhash_pairs",
        "t_sample_bottomk_per_source", "vx_semdedup_quantized",
        "t_dsir_select_topk", "stat_moments_quantity")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
