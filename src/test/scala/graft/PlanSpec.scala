package graft

/** Plan-regression guards (SURVEY.md §4): the physical properties the
  * 100 TB design depends on must be visible in the optimized plans —
  * pushdown reaching the scan, broadcasts on dims, map-side partial
  * aggregation, rank-limit pushdown. Catching a regression here is cheaper
  * than finding it in a bench.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.executedPlan.toString

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filters and column pruning reach the parquet scan (P6)") {
    val f = formatted("p6_filter_project")
    assert(f.contains("PushedFilters"), "no pushed filters section")
    assert(f.contains("GreaterThanOrEqual(l_shipdate") &&
      f.contains("EqualTo(l_returnflag,R)"), s"filters not pushed:\n$f")
    // pruned read schema: only the 7 referenced columns, not the full table
    val schemaLine = f.linesIterator.find(_.contains("ReadSchema")).get
    assert(!schemaLine.contains("l_tax"), "scan reads unreferenced columns")
  }

  test("dim-chain joins broadcast (J1)") {
    val p = plan("j1_region_customer_rollup")
    assert(p.contains("BroadcastHashJoin"), "dims not broadcast")
    assert(!p.contains("SortMergeJoin"), "dim join fell back to sort-merge")
  }

  test("fact-fact join broadcasts the smaller side at this SF (J2)") {
    val p = plan("j2_top_orders_by_revenue")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("typed vector aggregation runs with partial (map-side) aggregation") {
    val p = plan("vx_fast_centroid_cosine")
    // partial + final ObjectHashAggregate pair around the exchange
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation:\n$p")
  }

  test("per-group rank caps push a group limit below the window sort") {
    val p = plan("vx_cka_group_matrix")
    assert(p.contains("WindowGroupLimit"), "rank filter not pushed to group limit")
  }

  test("global top-k is TakeOrdered, not full sort") {
    val p = plan("l3_top10_orders")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for LIMIT:\n$p")
  }

  test("centroid-cosine self-join reuses one exchange instead of caching") {
    val df = SparkEntry.queries("v_centroid_cosine_matrix")(spark, sf001)
    df.collect() // AQE finalizes reuse decisions at execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("TableCacheQueryStage") ||
      p.contains("ReusedQueryStage"),
      s"sums subtree recomputed per branch:\n$p")
  }

  test("ntile runs as the two-pass range plan, never a one-partition window") {
    val p = plan("w_ntile_acctbal_quartiles")
    assert(!p.contains("Window"), s"ntile fell back to a window:\n$p")
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning") ||
      p.contains("REPARTITION_BY_RANGE"), s"no range repartition in ntile plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast-joined:\n$p")
  }
}
