package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Exact._

/** Core relational pack (SURVEY.md §7.2 step 1): projections/filters (P1–P9),
  * joins (J1/J2/J4 + semi/anti/outer), set ops (T1–T3), aggregations
  * (A2/A8 + distinct/rollup), windows (§2.9), sampling/sort/limit (L1–L7),
  * scalar functions (F1–F10). Every query is declarative DataFrame API so
  * Catalyst pushes filters/projections into the parquet scan and picks
  * broadcast joins for the dim tables; every query ends in a total ORDER BY
  * for hash-stable oracle compare.
  */
object RelationalQueries extends QueryPack {

  // ---- A2/F6: TPC-H Q1-style pricing summary (grouped aggregate pack) ----
  private val pricingSummary = OracleQuery(
    "a2_pricing_summary",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${DSUM("l_quantity")} AS sum_qty,
      ${DSUM("l_extendedprice")} AS sum_base_price,
      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${DSUM("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${DAVG("l_quantity")} AS avg_qty,
      ${DAVG("l_extendedprice")} AS avg_price,
      ${DAVG("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  // ---- P6/S1: filter + projection (pushdown to the parquet scan) ----
  private val filterProject = OracleQuery(
    "p6_filter_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")
          && col("l_returnflag") === "R" && col("l_quantity") <= 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
      l_extendedprice * (1.0 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_returnflag = 'R' AND l_quantity <= 5
    ORDER BY l_orderkey, l_linenumber"""))

  // ---- J1: dim-chain join, broadcast-friendly (region→nation→customer) ----
  private val regionRollup = OracleQuery(
    "j1_region_customer_rollup",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"))
    },
    Some(s"""SELECT r_name, COUNT(*) AS n_customers, ${DSUM("c_acctbal")} AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name"""))

  // ---- J2: fact-fact equi join + agg + deterministic top-k ----
  private val topOrdersByRevenue = OracleQuery(
    "j2_top_orders_by_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT o_orderkey, o_custkey, o_orderdate,
      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_custkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  // ---- left_semi: EXISTS restriction (J1-style set restriction) ----
  private val semiJoin = OracleQuery(
    "j_semi_high_value_customers",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
    ORDER BY c_custkey"""))

  // ---- left_anti: NOT EXISTS ----
  private val antiJoin = OracleQuery(
    "j_anti_customers_without_orders",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_nationkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey"""))

  // ---- left outer join keeping empty groups (P9 inverse) ----
  private val outerJoin = OracleQuery(
    "j_outer_nation_customer_counts",
    (s, d) => {
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name ORDER BY n_nationkey"""))

  // ---- J4: self cross-join 2-combinations (pairwise-groups idiom) ----
  private val crossPairs = OracleQuery(
    "j4_region_pairs",
    (s, d) => {
      val r = Tables.region(s, d)
      val a = r.select(col("r_name").as("name_a"))
      val b = r.select(col("r_name").as("name_b"))
      a.crossJoin(b).filter(col("name_a") < col("name_b"))
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""SELECT a.r_name AS name_a, b.r_name AS name_b
    FROM region a, region b WHERE a.r_name < b.r_name
    ORDER BY name_a, name_b"""))

  // ---- T2: union (vertical stack with discriminator column) ----
  private val unionParties = OracleQuery(
    "t2_union_parties",
    (s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"), lit("customer").as("kind"))
      val p = Tables.supplier(s, d)
        .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"), lit("supplier").as("kind"))
      c.unionByName(p).orderBy(col("name"))
    },
    Some("""SELECT * FROM (
      SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
    ) ORDER BY name"""))

  // ---- T1: INTERSECT ----
  private val intersectNations = OracleQuery(
    "t1_intersect_nations",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val p = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(p).orderBy(col("nationkey"))
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
    INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  // ---- EXCEPT (free in Spark; SURVEY.md §2.6) ----
  private val exceptNations = OracleQuery(
    "t_except_nations",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val p = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.except(p).orderBy(col("nationkey"))
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
    EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  // ---- A4/L4 window: top-k per group by measure ----
  private val rankTopParts = OracleQuery(
    "w_rank_top3_parts_per_brand",
    (s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_brand"), col("rn"))
    },
    Some("""SELECT p_brand, rn, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
        ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) WHERE rn <= 3 ORDER BY p_brand, rn"""))

  // ---- analytic window: lag/lead over event time ----
  private val lagLead = OracleQuery(
    "w_lag_lead_events",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          lead(col("event_id"), 1).over(w).as("next_event_id"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, ts,
      LAG(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
      LEAD(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
    FROM events ORDER BY user_id, ts, event_id"""))

  // ---- LOCF gap-fill (forward fill): carry the last non-null observation
  //      forward per user — THE standard event-stream repair for sparse
  //      gauges. Nulls are manufactured (the corpus has none) by blanking
  //      every non-"purchase" reading; `last(..., ignoreNulls)` over the
  //      running frame implements the carry, DuckDB's IGNORE NULLS window
  //      is the independent twin. Values are raw parquet doubles picked,
  //      not computed — deterministic cross-engine ----
  private val gapFill = OracleQuery(
    "w_gap_fill_locf",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_type") === "purchase", col("value")).as("reading"))
        .withColumn("filled",
          last(col("reading"), ignoreNulls = true).over(w))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, ts,
      CASE WHEN event_type = 'purchase' THEN value END AS reading,
      LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM events ORDER BY user_id, ts, event_id"""))

  // ---- frame-spec window: running total. Even an ordered frame is not fp-
  //      safe cross-engine (DuckDB aggregates window frames via segment
  //      trees, a different fp association), so the sum is decimal-exact ----
  private val runningTotal = OracleQuery(
    "w_running_total_per_user",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(27, 6)))
            .over(w).cast("double").as("running_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, ts, value,
      CAST(SUM(CAST(value AS DECIMAL(27,6)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events ORDER BY user_id, ts, event_id"""))

  // ---- L1: deterministic seeded per-group sample (hash-order top-k).
  //      Arithmetic hash (not engine hash builtins) so the oracle matches
  //      bit-for-bit; semantics = seeded no-replacement cap (SURVEY.md §7.3) --
  private val groupSample = OracleQuery(
    "l1_seeded_group_sample",
    (s, d) => {
      val hkey = (col("l_orderkey") * 131 + col("l_linenumber") * 7919 + 42) % 999983
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(hkey, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_returnflag"), col("rn"))
    },
    Some("""SELECT l_returnflag, rn, l_orderkey, l_linenumber FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
        ROW_NUMBER() OVER (PARTITION BY l_returnflag
          ORDER BY (l_orderkey * 131 + l_linenumber * 7919 + 42) % 999983,
                   l_orderkey, l_linenumber) AS rn
      FROM lineitem) WHERE rn <= 5 ORDER BY l_returnflag, rn"""))

  // ---- L3: global deterministic top-k ----
  private val topOrders = OracleQuery(
    "l3_top10_orders",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  // ---- distinct aggregation ----
  private val distinctCounts = OracleQuery(
    "agg_distinct_counts",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---- ROLLUP (engine-added vs reference; SURVEY.md §2.4 note). COALESCE to
  //      sentinels so NULL-ordering dialect differences can't bite ----
  private val rollupOrders = OracleQuery(
    "agg_rollup_status_priority",
    (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority")),
    Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""))

  // ---- CUBE ----
  private val cubeLineitem = OracleQuery(
    "agg_cube_flags",
    (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy(col("returnflag"), col("linestatus")),
    Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      COUNT(*) AS n, ${DSUM("l_quantity")} AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus"""))

  // ---- P7: HAVING / min-group-size predicate ----
  private val havingMinGroup = OracleQuery(
    "p7_having_min_group_size",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 45)
        .orderBy(col("l_partkey")),
    Some("""SELECT l_partkey, COUNT(*) AS n FROM lineitem
    GROUP BY l_partkey HAVING COUNT(*) >= 45 ORDER BY l_partkey"""))

  // ---- F1–F5/P1–P5: string function pack (suffix parse = the reference's
  //      group-name extraction, src/extract_embedding.py:19-24) ----
  private val stringPack = OracleQuery(
    "f_string_pack",
    (s, d) =>
      Tables.nation(s, d)
        .select(
          col("n_name"),
          expr("split_part(n_name, '_', 2)").cast("int").as("suffix_id"),
          lower(col("n_name")).as("lowered"),
          length(col("n_name")).as("name_len"),
          concat(lit("nation/"), col("n_name")).as("prefixed"),
          regexp_replace(col("n_name"), "_", "-").as("sanitized"),
          substring(col("n_name"), 1, 3).as("first3"),
          col("n_name").startsWith("NATION").as("is_nation"))
        .orderBy(col("n_name")),
    Some("""SELECT n_name,
      CAST(split_part(n_name, '_', 2) AS INT) AS suffix_id,
      lower(n_name) AS lowered,
      CAST(length(n_name) AS INT) AS name_len,
      'nation/' || n_name AS prefixed,
      replace(n_name, '_', '-') AS sanitized,
      substring(n_name, 1, 3) AS first3,
      n_name LIKE 'NATION%' AS is_nation
    FROM nation ORDER BY n_name"""))

  // ---- date/time pack ----
  private val datePack = OracleQuery(
    "f_date_pack",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("int").as("yr"),
          month(col("o_orderdate")).cast("int").as("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("yr"), col("mo")),
    Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS yr,
      CAST(month(o_orderdate) AS INT) AS mo,
      COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
    FROM orders GROUP BY 1, 2 ORDER BY yr, mo"""))

  // ---- JSON extraction over events.props ----
  private val jsonPack = OracleQuery(
    "f_json_props_k",
    (s, d) =>
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
      COUNT(*) AS n FROM events GROUP BY 1 ORDER BY k"""))

  // ---- CASE WHEN bucketing ----
  private val caseBucket = OracleQuery(
    "f_case_price_bands",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          when(col("o_totalprice") < 100000.0, "low")
            .when(col("o_totalprice") < 250000.0, "mid")
            .otherwise("high").as("band"),
          col("o_totalprice"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("band")),
    Some(s"""SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low'
                 WHEN o_totalprice < 250000.0 THEN 'mid'
                 ELSE 'high' END AS band,
      COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
    FROM orders GROUP BY 1 ORDER BY band"""))

  // ---- F6/A6/A7: scalar math pack (clamp/relu/eps idioms,
  //      src/gradcam_dynamic.py:172-175). Transcendentals rounded: libm last-
  //      ulp may differ across engines; sqrt/abs/mult are IEEE-exact ----
  private val mathPack = OracleQuery(
    "f_math_pack",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          sqrt(col("l_extendedprice")).as("sqrt_price"),
          abs(col("l_discount") - 0.05).as("abs_disc_delta"),
          ceil(col("l_quantity") / 7.0).cast("long").as("ceil_q7"),
          floor(col("l_quantity") / 7.0).cast("long").as("floor_q7"),
          greatest(least(col("l_quantity"), lit(40.0)), lit(5.0)).as("clamped_qty"),
          greatest(col("l_quantity") - 25.0, lit(0.0)).as("relu_qty"),
          round(log(col("l_extendedprice")), 6).as("ln_price_r6"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber,
      sqrt(l_extendedprice) AS sqrt_price,
      abs(l_discount - 0.05) AS abs_disc_delta,
      CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q7,
      CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_q7,
      greatest(least(l_quantity, 40.0), 5.0) AS clamped_qty,
      greatest(l_quantity - 25.0, 0.0) AS relu_qty,
      round(ln(l_extendedprice), 6) AS ln_price_r6
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber"""))

  // ---- ntile quartiles. NOT `ntile(4).over(Window.orderBy(...))`: an
  //      empty-partitionBy window collapses every row into ONE partition —
  //      a single-task sort at 100 TB. GlobalRank.withNtile is the two-pass
  //      scale plan (range repartition + per-partition offsets) with
  //      identical NTILE semantics; PlanSpec pins the no-window shape ----
  private val ntileQuartiles = OracleQuery(
    "w_ntile_acctbal_quartiles",
    (s, d) =>
      graft.operators.GlobalRank.withNtile(
          Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          4, "quartile", col("c_acctbal"), col("c_custkey"))
        .select(col("c_custkey"), col("c_acctbal"), col("quartile"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_acctbal,
      NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer ORDER BY c_custkey"""))

  // ---- F10: modular color assignment via dense_rank ----
  private val colorMod = OracleQuery(
    "f10_color_assignment",
    (s, d) => {
      // global window, but over the DISTINCT brand relation (≤ tens of
      // rows at any corpus scale) — the single partition holds a bounded
      // dimension domain, not data; for data-sized inputs use GlobalRank
      val w = Window.orderBy(col("p_brand"))
      Tables.part(s, d)
        .select(col("p_brand")).distinct()
        .select(col("p_brand"), ((dense_rank().over(w) - 1) % 20).as("color_id"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand,
      (DENSE_RANK() OVER (ORDER BY p_brand) - 1) % 20 AS color_id
    FROM (SELECT DISTINCT p_brand FROM part) ORDER BY p_brand"""))

  override val all: Seq[OracleQuery] = Seq(
    pricingSummary, filterProject, regionRollup, topOrdersByRevenue,
    semiJoin, antiJoin, outerJoin, crossPairs,
    unionParties, intersectNations, exceptNations,
    rankTopParts, lagLead, runningTotal, gapFill,
    groupSample, topOrders, distinctCounts,
    rollupOrders, cubeLineitem, havingMinGroup,
    stringPack, datePack, jsonPack, caseBucket, mathPack,
    ntileQuartiles, colorMod)
}
