package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Exact._

/** Second relational pack: the SURVEY.md §2 operators not covered by
  * RelationalQueries — P2 fallback parsing, J6 last-wins merge, L6 pair
  * sampling, A8 count alignment, range join (§2.3 engine-added), exact
  * correlation, median/percentile, range-frame and first/last windows,
  * ordered string aggregation.
  */
object AdvancedQueries extends QueryPack {

  // ---- P2: double-underscore parse with single-underscore fallback
  //      (src/analyze_embedding_with_tsne.py:28-35) ----
  private val p2Parse = OracleQuery(
    "p2_suffix_parse_fallback",
    (s, d) => {
      val withKey = Tables.part(s, d)
        .select(col("p_partkey"),
          concat(col("p_brand"),
            when(col("p_partkey") % 2 === 0, lit("__")).otherwise(lit("_")),
            col("p_type")).as("k"))
      withKey.select(col("p_partkey"),
        when(col("k").contains("__"), element_at(split(col("k"), "__"), -1))
          .otherwise(element_at(split(col("k"), "_"), -1)).as("parsed"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey,
      CASE WHEN contains(k, '__') THEN split_part(k, '__', -1)
           ELSE split_part(k, '_', -1) END AS parsed
    FROM (SELECT p_partkey,
            p_brand || (CASE WHEN p_partkey % 2 = 0 THEN '__' ELSE '_' END) || p_type AS k
          FROM part)
    ORDER BY p_partkey"""))

  // ---- J6/T3: map-merge union, last wins per key (dict.update semantics,
  //      src/extract_embedding_multiple.py:183-190): stack two event slices,
  //      priority column decides the winner per event_id ----
  private val lastWinsMerge = OracleQuery(
    "j6_last_wins_merge",
    (s, d) => {
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_id") % 3 === 0)
        .select(col("event_id"), col("event_type"), lit(1).as("src"))
      val b = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), concat(lit("B_"), col("event_type")).as("event_type"),
          lit(2).as("src"))
      val w = Window.partitionBy(col("event_id")).orderBy(col("src").desc)
      a.unionByName(b)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("event_type"), col("src"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type, src FROM (
      SELECT event_id, event_type, src,
        ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY src DESC) AS rn
      FROM (
        SELECT event_id, event_type, 1 AS src FROM events WHERE event_id % 3 = 0
        UNION ALL
        SELECT event_id, 'B_' || event_type, 2 AS src FROM events WHERE event_id % 2 = 0
      )) WHERE rn = 1 ORDER BY event_id"""))

  // ---- L6/J4: shuffled pair sample — hash-order limit over all 2-
  //      combinations (src/analyze_embedding_with_tsne.py:236-242) ----
  private val pairSample = OracleQuery(
    "l6_pair_sample",
    (s, d) => {
      val n = Tables.nation(s, d).select(col("n_name"))
      val pairs = n.as("a").select(col("n_name").as("name_a"))
        .crossJoin(n.as("b").select(col("n_name").as("name_b")))
        .filter(col("name_a") < col("name_b"))
      pairs
        .withColumn("hk",
          (length(col("name_a")) * 131 + length(col("name_b")) * 7919
            + ascii(col("name_a")) * 31 + ascii(col("name_b"))) % 997)
        .orderBy(col("hk"), col("name_a"), col("name_b"))
        .limit(10)
        .select(col("name_a"), col("name_b"))
    },
    Some("""SELECT name_a, name_b FROM (
      SELECT a.n_name AS name_a, b.n_name AS name_b,
        (length(a.n_name) * 131 + length(b.n_name) * 7919
          + ascii(a.n_name) * 31 + ascii(b.n_name)) % 997 AS hk
      FROM nation a, nation b WHERE a.n_name < b.n_name
      ORDER BY hk, name_a, name_b LIMIT 10)
    ORDER BY hk, name_a, name_b"""))

  // ---- A8: count alignment — n = least(count_a, count_b) per joined key
  //      (src/compare_embeddings_vs_features.py:208-218) ----
  private val alignedCounts = OracleQuery(
    "a8_aligned_group_counts",
    (s, d) => {
      val ca = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val cb = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      ca.join(cb, Seq("nationkey"))
        .select(col("nationkey"), col("n_cust"), col("n_supp"),
          least(col("n_cust"), col("n_supp")).as("aligned_n"))
        .orderBy(col("nationkey"))
    },
    Some("""SELECT c.nationkey, n_cust, n_supp, least(n_cust, n_supp) AS aligned_n
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
          FROM customer GROUP BY 1) c
    JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
          FROM supplier GROUP BY 1) s ON c.nationkey = s.nationkey
    ORDER BY c.nationkey"""))

  // ---- scalar-subquery idiom: orders above their customer's average ----
  private val aboveCustomerAvg = OracleQuery(
    "sq_orders_above_customer_avg",
    (s, d) => {
      val o = Tables.orders(s, d)
      val avgPerCust = o.groupBy(col("o_custkey").as("k"))
        .agg((dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      o.join(avgPerCust, o("o_custkey") === avgPerCust("k"))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o JOIN (
      SELECT o_custkey AS k, ${DSUM("o_totalprice")} / COUNT(*) AS avg_price
      FROM orders GROUP BY 1) a ON o.o_custkey = a.k
    WHERE o_totalprice > avg_price * 1.5
    ORDER BY o_orderkey"""))

  // ---- range join (§2.3 engine-added): lineitems shipped within 30 days of
  //      their order date. Equi-key + range predicate → Spark plans a
  //      sort-merge on the key with the range as a post-filter ----
  private val rangeJoin = OracleQuery(
    "j_range_ship_within_30d",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey")
          && li("l_shipdate") >= o("o_orderdate")
          && li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL '30' DAY"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_quick_ships"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, COUNT(*) AS n_quick_ships
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL '30 days'
    GROUP BY o_orderkey ORDER BY o_orderkey"""))

  // ---- exact correlation via integer-quantized sufficient statistics
  //      (same cross-engine scheme as VectorQueries: floor() is IEEE-
  //      identical, integer sums exact, int→double correctly rounded) ----
  private val exactCorr = OracleQuery(
    "stat_corr_qty_price",
    (s, d) => {
      val q = Tables.lineitem(s, d).select(
        col("l_returnflag"),
        floor(col("l_quantity")).cast(DecimalType(18, 0)).as("x"),
        floor(col("l_extendedprice") * 100).cast(DecimalType(18, 0)).as("y"))
      q.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"),
          sum(col("x") * col("y")).cast("double").as("sxy"))
        .select(col("l_returnflag"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, n,
      (n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
    FROM (
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(x * x) AS DOUBLE) AS sxx, CAST(SUM(y * y) AS DOUBLE) AS syy,
        CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM (SELECT l_returnflag,
              CAST(floor(l_quantity) AS DECIMAL(18,0)) AS x,
              CAST(floor(l_extendedprice * 100) AS DECIMAL(18,0)) AS y
            FROM lineitem)
      GROUP BY l_returnflag)
    ORDER BY l_returnflag"""))

  // ---- single-pass distribution profile: mean/variance/skewness/kurtosis
  //      from raw power sums — the scale shape for statistical profiling
  //      (one map-side-combinable aggregation, four exact DECIMAL sums; no
  //      second centering pass). Central moments and the ratios compute in
  //      double from exact integers with op-for-op identical expressions,
  //      so the floats are deterministic cross-engine (built-in skewness()
  //      is deliberately avoided: engines disagree on sample-vs-population
  //      adjustment, the raw-sums algebra is unambiguous) ----
  private val momentsPack = OracleQuery(
    "stat_moments_quantity",
    (s, d) => {
      // LONG, not DECIMAL: decimal's type-level precision (p1+p2+1 per
      // multiply) overflows 38 digits at the 4th power even though the
      // VALUES are tiny; long math is exact here (x^4 <= 6.25e6, sums
      // <= ~4e12 << 2^53, so the double casts are exact too)
      val q = Tables.lineitem(s, d).select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("x"))
      q.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("x") * col("x") * col("x")).cast("double").as("sxxx"),
          sum(col("x") * col("x") * col("x") * col("x")).cast("double").as("sxxxx"))
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("q1", col("sxx") / col("n"))
        .withColumn("q2", col("sxxx") / col("n"))
        .withColumn("q3", col("sxxxx") / col("n"))
        .withColumn("m2", col("q1") - col("mean") * col("mean"))
        .withColumn("m3", col("q2") - lit(3.0) * col("mean") * col("q1")
          + lit(2.0) * col("mean") * col("mean") * col("mean"))
        .withColumn("m4", col("q3") - lit(4.0) * col("mean") * col("q2")
          + lit(6.0) * col("mean") * col("mean") * col("q1")
          - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
        .select(col("l_returnflag"), col("n"), col("mean"),
          col("m2").as("variance"),
          (col("m3") / (col("m2") * sqrt(col("m2")))).as("skewness"),
          (col("m4") / (col("m2") * col("m2")) - lit(3.0)).as("kurtosis"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, n, mean, m2 AS variance,
      m3 / (m2 * sqrt(m2)) AS skewness,
      m4 / (m2 * m2) - 3.0 AS kurtosis
    FROM (
      SELECT l_returnflag, n, mean, q1, q2, q3,
        q1 - mean * mean AS m2,
        q2 - 3.0 * mean * q1 + 2.0 * mean * mean * mean AS m3,
        q3 - 4.0 * mean * q2 + 6.0 * mean * mean * q1
          - 3.0 * mean * mean * mean * mean AS m4
      FROM (
        SELECT l_returnflag, n, sx / n AS mean, sxx / n AS q1,
          sxxx / n AS q2, sxxxx / n AS q3
        FROM (
          SELECT l_returnflag, COUNT(*) AS n,
            CAST(SUM(x) AS DOUBLE) AS sx,
            CAST(SUM(x * x) AS DOUBLE) AS sxx,
            CAST(SUM(x * x * x) AS DOUBLE) AS sxxx,
            CAST(SUM(x * x * x * x) AS DOUBLE) AS sxxxx
          FROM (SELECT l_returnflag,
                  CAST(floor(l_quantity) AS BIGINT) AS x
                FROM lineitem)
          GROUP BY l_returnflag)))
    ORDER BY l_returnflag"""))

  // ---- equi-width histogram: the profiling shape that scales (one
  //      map-side-combinable aggregation over computed bucket ids; never a
  //      sort or a per-value gather). Bucket = floor(x / width) on an
  //      exact-integer-domain double — deterministic cross-engine ----
  private val histogram = OracleQuery(
    "stat_histogram_totalprice",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"),
          (floor(col("o_totalprice") / 25000.0) * 25000).cast("long").as("bucket_lo"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("bucket_lo")),
    Some("""SELECT o_orderstatus,
      CAST(floor(o_totalprice / 25000.0) * 25000 AS BIGINT) AS bucket_lo,
      COUNT(*) AS n
    FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, bucket_lo"""))

  // ---- equi-DEPTH histogram: 8 equal-count buckets per order status with
  //      exact bucket boundaries — the complement of the equi-width form
  //      above, and the profile a data-skew report actually wants (bucket
  //      counts fixed, boundaries float). Runs on the same bucketed
  //      two-pass rank as every per-group quantile op in the repo (no
  //      per-status window sort; PlanSpec pins ntile plans globally);
  //      boundaries are raw parquet doubles picked, not computed →
  //      deterministic cross-engine ----
  private val histogramEquidepth = OracleQuery(
    "stat_histogram_equidepth",
    (s, d) => {
      val tiled = graft.operators.GlobalRank.withGroupNtile(
        Tables.orders(s, d).select(col("o_orderstatus"), col("o_totalprice"),
          col("o_orderkey")),
        col("o_orderstatus"), 8, "tile", col("o_totalprice"), col("o_orderkey"))
      tiled.groupBy(col("o_orderstatus"), col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderstatus"), col("tile"))
    },
    Some("""SELECT o_orderstatus, tile, COUNT(*) AS n,
      MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM (SELECT o_orderstatus, o_totalprice,
            NTILE(8) OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice, o_orderkey) AS tile
          FROM orders)
    GROUP BY 1, 2 ORDER BY o_orderstatus, tile"""))

  // ---- null-semantics pack: the corners users hit when keys go null.
  //      The corpus has no nulls, so nullif() manufactures them, then the
  //      pack exercises (a) GROUP BY with a null group, (b) null-safe
  //      equi-join (<=> / IS NOT DISTINCT FROM — the ONLY join form where
  //      the null group survives; a plain equi-join drops it silently),
  //      (c) explicit NULLS FIRST ordering, (d) coalesce labeling. Both
  //      engines implement the same ANSI semantics; the oracle proves the
  //      engine's null group flows through join and sort intact ----
  private val nullSemantics = OracleQuery(
    "f_null_semantics_pack",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("pri"),
          col("o_totalprice"))
      val agg = o.groupBy(col("pri"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      val dim = agg.select(col("pri").as("pri2"))
        .withColumn("label", coalesce(col("pri2"), lit("UNSPECIFIED")))
      agg.join(dim, col("pri") <=> col("pri2"))
        .select(col("label"), col("pri"), col("n_orders"), col("revenue"))
        .orderBy(col("pri").asc_nulls_first)
    },
    Some(s"""WITH o AS (
      SELECT nullif(o_orderpriority, '3-MEDIUM') AS pri, o_totalprice
      FROM orders
    ), agg AS (
      SELECT pri, COUNT(*) AS n_orders, ${DSUM("o_totalprice")} AS revenue
      FROM o GROUP BY pri
    ), dim AS (
      SELECT pri AS pri2, coalesce(pri, 'UNSPECIFIED') AS label FROM agg
    )
    SELECT label, pri, n_orders, revenue
    FROM agg JOIN dim ON pri IS NOT DISTINCT FROM pri2
    ORDER BY pri NULLS FIRST"""))

  // ---- exact order statistics: median + 90th percentile (both engines use
  //      linear interpolation for continuous percentiles over doubles —
  //      identical picks and identical IEEE interpolation) ----
  private val percentiles = OracleQuery(
    "stat_median_p90",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          median(col("o_totalprice")).as("median_price"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000000)).as("approx_median"))
        .select(col("o_orderstatus"), col("median_price"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus, median(o_totalprice) AS median_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ---- range-frame window: trailing-30-day order count per customer,
  //      numeric RANGE frame over epoch seconds (identical in both) ----
  private val trailingWindow = OracleQuery(
    "w_range_trailing_30d",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, d)
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
        .withColumn("n_orders_30d", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("n_orders_30d"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                     RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_orders_30d
    FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  // ---- declarative data-quality contract report (the Deequ pattern):
  //      four row-level constraints in ONE aggregation pass plus a
  //      key-uniqueness check unioned in — the promote-gate a snapshot
  //      passes before downstream jobs trust it. Counts are exact
  //      integers → full oracle ----
  private val dataQualityReport = OracleQuery(
    "t_data_quality_report",
    (s, d) => {
      val o = Tables.orders(s, d)
      val rowChecks = graft.operators.QualityChecks.report(o, Seq(
        "date_not_null" -> col("o_orderdate").isNotNull,
        "priority_format" -> col("o_orderpriority").rlike("^[1-5]-"),
        "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
        "totalprice_positive" -> (col("o_totalprice") > 0)))
      val unique = graft.operators.QualityChecks.uniqueCheck(o,
        "orderkey_unique", Seq("o_orderkey"))
      rowChecks.unionByName(unique).orderBy(col("check"))
    },
    Some("""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    rowchecks AS (
      SELECT 'date_not_null' AS check, n.n AS n_rows,
        CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violations
      FROM orders, n GROUP BY n.n
      UNION ALL
      SELECT 'priority_format', n.n,
        CAST(SUM(CASE WHEN NOT COALESCE(regexp_matches(o_orderpriority,
          '^[1-5]-'), false) THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders, n GROUP BY n.n
      UNION ALL
      SELECT 'status_in_domain', n.n,
        CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
          OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders, n GROUP BY n.n
      UNION ALL
      SELECT 'totalprice_positive', n.n,
        CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, false)
          THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders, n GROUP BY n.n
      UNION ALL
      SELECT 'orderkey_unique', n.n,
        CAST(COALESCE((SELECT SUM(c) FROM (
          SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
          HAVING COUNT(*) > 1)), 0) AS BIGINT)
      FROM n
    )
    SELECT "check", n_rows, n_violations, n_violations = 0 AS pass
    FROM rowchecks ORDER BY "check""""))

  // ---- Poisson bootstrap (Chamandy et al. 2012): the MAP-ONLY bootstrap
  //      that works at 100 TB. The classic resample-n-rows-B-times
  //      bootstrap needs B global draws of the corpus; the Poisson
  //      formulation gives each row an independent Poisson(1) weight per
  //      replicate — one pass, B weights per row, partial-aggregating to
  //      B keys. Weights derive from the knuth32 hash through the
  //      INVERSE Poisson CDF with thresholds hardcoded as identical
  //      decimal literals in both engines (both parse to the same
  //      binary64, u is exact by construction, so every branch decision
  //      is bit-identical) and the replicate means use exact decimal
  //      sums → the whole 64-replicate bootstrap distribution is
  //      cross-engine EXACT, full oracle ----
  private val bootstrapMeans = OracleQuery(
    "stat_bootstrap_poisson_means",
    (s, d) => {
      val B = 64
      // P(Pois(1) <= k) thresholds, k = 0..8; tail clips to 9
      val t = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
        0.9999167588507119, 0.9999897508033253, 0.9999988747974049)
      val li = Tables.lineitem(s, d)
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("rid"),
          col("l_quantity").cast("double").as("x"))
        .select(col("rid"), col("x"),
          explode(sequence(lit(0), lit(B - 1))).as("b"))
        .withColumn("u",
          (graft.operators.Dedup.knuth32(col("rid") * lit(B.toLong) + col("b"))
            + lit(0.5)) / lit(4294967296.0))
      val w = t.zipWithIndex.foldRight(lit(9): Column) {
        case ((thr, k), rest) => when(col("u") < thr, lit(k)).otherwise(rest)
      }
      li.withColumn("w", w)
        .filter(col("w") > 0)
        .groupBy(col("b").cast("long").as("b"))
        .agg(sum(col("w")).cast("long").as("n_eff"),
          (dsum(col("w") * col("x")) /
            sum(col("w")).cast("double")).as("mean_boot"))
        .orderBy(col("b"))
    },
    Some(s"""WITH li AS (
      SELECT l_orderkey * 8 + l_linenumber AS rid,
        CAST(l_quantity AS DOUBLE) AS x
      FROM lineitem
    ), e AS (
      SELECT rid, x, unnest(range(0, 64)) AS b FROM li
    ), u AS (
      SELECT b, x, ((${KNUTH32("rid * 64 + b")}) + 0.5) / 4294967296.0 AS u
      FROM e
    ), w AS (
      SELECT b, x,
        CASE WHEN u < 0.36787944117144233 THEN 0
             WHEN u < 0.7357588823428847 THEN 1
             WHEN u < 0.9196986029286058 THEN 2
             WHEN u < 0.9810118431238462 THEN 3
             WHEN u < 0.9963401531726563 THEN 4
             WHEN u < 0.9994058151824183 THEN 5
             WHEN u < 0.9999167588507119 THEN 6
             WHEN u < 0.9999897508033253 THEN 7
             WHEN u < 0.9999988747974049 THEN 8
             ELSE 9 END AS w
      FROM u
    )
    SELECT CAST(b AS BIGINT) AS b,
      CAST(SUM(w) AS BIGINT) AS n_eff,
      ${DSUM("w * x")} / CAST(SUM(w) AS DOUBLE) AS mean_boot
    FROM w WHERE w > 0
    GROUP BY b ORDER BY b"""))

  // ---- per-group OLS trend (closed-form simple regression from exact
  //      power sums — the distributed-regression shape: one pass of
  //      map-side-combinable sums, closed form on 4 scalars per group):
  //      daily revenue slope per order status. Integer x-sums are exact,
  //      double y-sums cross the exact-decimal boundary, the closed form
  //      evaluates in the identical operation order → full oracle on
  //      quantized slope/intercept ----
  private val olsTrend = OracleQuery(
    "stat_ols_trend_per_status",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderstatus"),
          (unix_timestamp(col("o_orderdate")) / lit(86400L)).cast("long")
            .as("x"),
          col("o_totalprice").cast("double").as("y"))
      o.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          dsum(col("y")).as("sy"),
          dsum(col("x").cast("double") * col("y"), 38, 6).as("sxy"))
        .select(col("o_orderstatus"), col("n"),
          floor(((col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
            * lit(1000000000.0)).cast("long").as("slope_e9"))
        .orderBy(col("o_orderstatus"))
    },
    Some(s"""WITH o AS (
      SELECT o_orderstatus,
        CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS x,
        CAST(o_totalprice AS DOUBLE) AS y
      FROM orders
    ), a AS (
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(x * x) AS BIGINT) AS sxx,
        ${DSUM("y")} AS sy,
        ${DSUM("CAST(x AS DOUBLE) * y", 38, 6)} AS sxy
      FROM o GROUP BY 1
    )
    SELECT o_orderstatus, n,
      CAST(floor(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000000000.0)
        AS BIGINT) AS slope_e9
    FROM a ORDER BY o_orderstatus"""))

  // ---- robust MAD outlier report (median absolute deviation, the
  //      robust-statistics alternative to vx_embedding_outliers'
  //      z-score): per-status exact medians, exact MAD, and the count
  //      beyond the 3σ-equivalent 4.4478·MAD fence. Every float is
  //      bit-identical cross-engine (exact medians, identical
  //      comparison operands) so med and mad ship UNQUANTIZED ----
  private val madOutliers = OracleQuery(
    "stat_mad_outliers",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_totalprice").cast("double")
          .as("y"))
      val med = o.groupBy(col("o_orderstatus"))
        .agg(median(col("y")).as("med"))
      val dev = o.join(broadcast(med), "o_orderstatus")
        .withColumn("ad", abs(col("y") - col("med")))
      val mad = dev.groupBy(col("o_orderstatus"))
        .agg(median(col("ad")).as("mad"))
      dev.join(broadcast(mad), "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
          max(col("mad")).as("mad"),
          sum(when(col("ad") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH o AS (
      SELECT o_orderstatus, CAST(o_totalprice AS DOUBLE) AS y FROM orders
    ), med AS (
      SELECT o_orderstatus, median(y) AS med FROM o GROUP BY 1
    ), dev AS (
      SELECT o.o_orderstatus, o.y, med.med, abs(o.y - med.med) AS ad
      FROM o JOIN med USING (o_orderstatus)
    ), mad AS (
      SELECT o_orderstatus, median(ad) AS mad FROM dev GROUP BY 1
    )
    SELECT dev.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
      MAX(dev.med) AS med, MAX(mad.mad) AS mad,
      CAST(SUM(CASE WHEN dev.ad > 4.4478 * mad.mad THEN 1 ELSE 0 END)
        AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (o_orderstatus)
    GROUP BY 1 ORDER BY 1"""))

  // ---- SCD2 validity intervals via gaps-and-islands: collapse each
  //      customer's order-status history into slowly-changing-dimension
  //      rows (valid_from, valid_to, is_current), opening a new interval
  //      only when the status CHANGES — the lakehouse dimension-table
  //      maintenance pattern. Two stacked windows (lag to flag changes,
  //      running sum to number islands) plus one group-by, ALL
  //      partitioned by the high-cardinality customer key — no global
  //      sort anywhere. Every step is deterministic (ties broken by
  //      order key) → full oracle ----
  private val scd2Intervals = OracleQuery(
    "w_scd2_validity_intervals",
    (s, d) => {
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val flagged = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderstatus"))
        .withColumn("chg",
          when(lag(col("o_orderstatus"), 1).over(byCust).isNull ||
            lag(col("o_orderstatus"), 1).over(byCust) =!= col("o_orderstatus"),
            1L).otherwise(0L))
        .withColumn("island", sum(col("chg")).over(byCust))
      flagged.groupBy(col("o_custkey"), col("island"), col("o_orderstatus"))
        .agg(min(col("o_orderdate")).as("valid_from"),
          count(lit(1)).as("n_orders"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("island"))))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("o_custkey"), col("island"), col("o_orderstatus"),
          col("valid_from"), col("valid_to"), col("n_orders"),
          col("is_current"))
        .orderBy(col("o_custkey"), col("island"))
    },
    Some("""WITH flagged AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
        CASE WHEN LAG(o_orderstatus) OVER w IS NULL
          OR LAG(o_orderstatus) OVER w <> o_orderstatus
          THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), islands AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS island
      FROM flagged
    ), iv AS (
      SELECT o_custkey, island, o_orderstatus,
        MIN(o_orderdate) AS valid_from,
        CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM islands GROUP BY 1, 2, 3
    )
    SELECT o_custkey, island, o_orderstatus, valid_from,
      LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY island)
        AS valid_to,
      n_orders,
      LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY island) IS NULL
        AS is_current
    FROM iv ORDER BY o_custkey, island"""))

  // ---- first/last value windows ----
  private val firstLast = OracleQuery(
    "w_first_last_event",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, ts,
      FIRST_VALUE(event_type) OVER w AS first_type,
      LAST_VALUE(event_type) OVER w AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id, ts, event_id"""))

  // ---- ordered string aggregation (deterministic listagg) ----
  private val stringAgg = OracleQuery(
    "agg_sorted_name_list",
    (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy(col("n_regionkey")),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // ---- grouping sets beyond rollup/cube ----
  private val groupingSets = OracleQuery(
    "agg_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COUNT(*) AS n
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY status, priority""")
    },
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY status, priority"""))

  // ---- TPC-H Q5-shape: 6-table join chain with a selective dim filter —
  //      the classic join-order / broadcast showcase. Catalyst broadcasts
  //      region→nation and the dim chain; only lineitem⋈orders shuffles ----
  private val q5ish = OracleQuery(
    "j_tpch_q5ish_local_supplier_volume",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d).filter(col("r_regionkey") <= 1))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey")
          && c("c_nationkey") === sup("s_nationkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name,
      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_regionkey <= 1
    GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // ---- TPC-H Q17-shape: revenue from small-quantity orders of one brand's
  //      parts, qty below 0.2× that part's average. The correlated scalar
  //      subquery is decorrelated BY HAND into a per-part aggregate — the
  //      plan a 100 TB run needs anyway (the subquery form rescans lineitem
  //      per part). Scale discipline: lineitem is pruned to the filtered
  //      brand's part keys BEFORE the aggregate, so (a) the avg is computed
  //      only for consumed parts (1/|brands| of the work) and (b) the
  //      aggregate's output is |brand parts| rows — small enough that AQE
  //      picks the join strategy itself; forcing a broadcast on a relation
  //      whose row count grows linearly with |part| would OOM at 100×.
  //      Pruning by partkey keeps every lineitem row of a surviving part,
  //      so each part's average is unchanged. Only the single-brand KEY
  //      column is hinted broadcast (~|part|/50 longs — a true dim).
  //      avg threshold compared in exact decimal-sum/count arithmetic so
  //      the row set is cross-engine deterministic ----
  private val q17ish = OracleQuery(
    "j_tpch_q17ish_small_qty_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val pk = broadcast(Tables.part(s, d)
        .filter(col("p_brand") === "Brand#4").select(col("p_partkey")))
      val brandLi = li.join(pk, li("l_partkey") === col("p_partkey"))
      val perPart = brandLi.groupBy(col("l_partkey").as("pk"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      brandLi.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(dsum(col("l_extendedprice")).as("total_price"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""WITH perpart AS (
      SELECT l_partkey AS pk, ${DAVG("l_quantity")} AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT ${DSUM("l_extendedprice")} AS total_price, COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#4'
    JOIN perpart ON l_partkey = pk
    WHERE l_quantity < 0.2 * avg_qty"""))

  // ---- TPC-H Q3-shape: shipping-priority top-k over a 3-table join ----
  private val q3ish = OracleQuery(
    "j_tpch_q3ish_shipping_priority",
    (s, d) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },
    Some(s"""SELECT l_orderkey, o_orderdate,
      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 20"""))

  // ---- higher-order array functions (Spark transform/filter/aggregate ↔
  //      DuckDB list_transform/list_filter): per-vector positive-dim count
  //      and clipped integer sum — the lambda surface, oracle-checked via
  //      integer quantization ----
  private val arrayHof = OracleQuery(
    "f_hof_array_ops",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(filter(col("embedding"), v => v > 0f)).as("n_positive"),
          aggregate(
            transform(col("embedding"), v => floor(v.cast("double") * 1000)),
            lit(0L), (acc, v) => acc + v.cast("long")).as("qsum"))
        .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
      CAST(len(list_filter(embedding, v -> v > 0)) AS INT) AS n_positive,
      CAST(list_sum(list_transform(embedding,
        v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS qsum
    FROM embeddings ORDER BY vec_id"""))

  // ---- regexp group extraction ----
  private val regexpGroups = OracleQuery(
    "f_regexp_extract_groups",
    (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "^([A-Za-z]+)#?(\\d*)$", 1).as("brand_word"),
          regexp_extract(col("p_brand"), "^([A-Za-z]+)#?(\\d*)$", 2).as("brand_num"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      regexp_extract(p_brand, '^([A-Za-z]+)#?(\d*)$', 1) AS brand_word,
      regexp_extract(p_brand, '^([A-Za-z]+)#?(\d*)$', 2) AS brand_num
    FROM part ORDER BY p_partkey"""))

  // ---- bag-semantics set ops (intersectAll / exceptAll) ----
  private val bagSetOps = OracleQuery(
    "t_bag_set_ops",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("k"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      val inter = c.intersectAll(sup)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
      val exc = sup.exceptAll(c)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
      inter.unionByName(exc).orderBy(col("op"), col("k"))
    },
    Some("""SELECT k, n, op FROM (
      SELECT k, COUNT(*) AS n, 'intersect_all' AS op FROM (
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY k
      UNION ALL
      SELECT k, COUNT(*) AS n, 'except_all' AS op FROM (
        SELECT s_nationkey AS k FROM supplier
        EXCEPT ALL SELECT c_nationkey FROM customer) GROUP BY k
    ) ORDER BY op, k"""))

  // ---- pivot (crosstab): status × priority counts. Oracle twin is the
  //      dialect-neutral CASE-aggregation form ----
  private val pivotQuery = OracleQuery(
    "agg_pivot_status_priority",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot(col("o_orderpriority"), Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("1-URGENT", "urgent")
        .withColumnRenamed("2-HIGH", "high")
        .withColumnRenamed("3-MEDIUM", "medium")
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
      CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS urgent,
      CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS BIGINT) AS high,
      CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS BIGINT) AS medium
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // ---- unpivot (melt): wide per-row measures → long (measure, value) ----
  private val unpivotQuery = OracleQuery(
    "t_unpivot_measures",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 50)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure")),
    Some("""SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
      FROM lineitem WHERE l_orderkey < 50
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem WHERE l_orderkey < 50
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
      FROM lineitem WHERE l_orderkey < 50
    ) ORDER BY l_orderkey, l_linenumber, measure"""))

  // ---- remaining ranking functions: percent_rank / cume_dist (pure rank
  //      arithmetic over identical orderings → IEEE-identical). Scale note:
  //      partitioned by mktsegment (5 values) — partition cardinality bounds
  //      window parallelism, inherent to the requested per-segment semantics;
  //      a skewed/low-cardinality key at 100 TB wants the GlobalRank
  //      two-pass pattern per segment instead ----
  private val rankStats = OracleQuery(
    "w_percent_rank_cume_dist",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
      PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey"""))

  // ---- TPC-H Q12-shape: CONDITIONAL aggregation — per-group counts split
  //      by a CASE over another table's column after an equi-join. The plan
  //      property under test: the CASE folds into the aggregate (one
  //      partial/final pair), never a pivot or a second scan ----
  private val q12ish = OracleQuery(
    "j_tpch_q12ish_priority_counts",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      val o = Tables.orders(s, d)
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    Some("""SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus"""))

  // ---- TPC-H Q19-shape: DISJUNCTIVE multi-column predicates over a join —
  //      revenue where (brand, quantity-range) alternatives hold. The plan
  //      property under test: the common conjuncts (p_partkey join key;
  //      per-branch pushable ranges) still prune, and the OR never forces a
  //      cartesian ----
  private val q19ish = OracleQuery(
    "j_tpch_q19ish_disjunctive_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val cond =
        (col("p_brand") === "Brand#1" &&
          col("l_quantity").between(1, 15) && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#2" &&
          col("l_quantity").between(10, 25) && col("p_size").between(1, 20)) ||
        (col("p_brand") === "Brand#3" &&
          col("l_quantity").between(20, 35) && col("p_size").between(1, 30))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .filter(cond)
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""SELECT
      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25
           AND p_size BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35
           AND p_size BETWEEN 1 AND 30)"""))

  // ---- TPC-H Q14-shape: conditional revenue SHARE — the promo fraction
  //      of total revenue in one aggregation pass (numerator = CASE-gated
  //      sum, denominator = full sum, divided after; never two scans).
  //      Exact-DECIMAL sums per the oracle convention; the final division
  //      is one IEEE double op on two exactly-agreed values ----
  private val q14ish = OracleQuery(
    "j_tpch_q14ish_promo_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp"))
      val p = Tables.part(s, d)
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .agg(
          (dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) * 100.0 /
            dsum(rev)).as("promo_share_pct"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""SELECT
      ${DSUM("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
        * 100.0 / ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS promo_share_pct,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'"""))

  // ---- TPC-H Q22-shape: scalar-subquery threshold + anti-join — count
  //      and balance of above-average customers with no RECENT order (the
  //      date restriction keeps the relation non-degenerate at every SF).
  //      The plan properties: the AVG is a one-row broadcast (not a
  //      per-row correlated rescan) and the NOT EXISTS compiles to a
  //      (broadcast) anti hash join over the pre-filtered orders side ----
  private val q22ish = OracleQuery(
    "j_tpch_q22ish_idle_rich_customers",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp"))
      // exact-DECIMAL average: a plain double AVG is summation-order
      // dependent and the threshold compare could flip boundary customers
      // cross-engine
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("__avg"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n_custs,
      ${DSUM("c_acctbal")} AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT ${DAVG("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ---- TPC-H Q7-shape: nation-pair trade volume — a 5-way join where the
  //      two tiny dims (supplier nation, customer nation) broadcast and the
  //      pair restriction prunes BEFORE the fact-fact join output grows.
  //      Plan property: nation joins are broadcasts; the only shuffles are
  //      the lineitem↔orders and orders↔customer equi-joins ----
  private val q7ish = OracleQuery(
    "j_tpch_q7ish_nation_pair_volume",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), su("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      CAST(year(l_shipdate) AS INT) AS l_year,
      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // ---- TPC-H Q10-shape: returned-item reporting — top 20 customers by
  //      refund-quarter revenue. Exact-DECIMAL revenue keeps the DESC
  //      ordering (and thus the LIMIT frontier) identical cross-engine;
  //      c_custkey breaks ties ----
  private val q10ish = OracleQuery(
    "j_tpch_q10ish_returned_revenue",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val n = Tables.nation(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name,
      ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  // ---- TPC-H Q13-shape: customer order-count DISTRIBUTION — a left outer
  //      join with an extra join-side predicate (not a WHERE: customers
  //      with zero qualifying orders must keep their 0 bucket), then a
  //      second aggregation over the first's output ----
  private val q13ish = OracleQuery(
    "j_tpch_q13ish_order_count_dist",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val perCust = c.join(o,
          c("c_custkey") === o("o_custkey") &&
            o("o_orderpriority") =!= "1-URGENT",
          "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"))
      perCust.groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("n_orders").desc)
    },
    Some("""SELECT n_orders, COUNT(*) AS n_custs FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY n_orders ORDER BY n_custs DESC, n_orders DESC"""))

  // ---- TPC-H Q18-shape: large-volume orders — a grouped HAVING over the
  //      fact table reused as a semi-filter carrying its aggregate. Plan
  //      property: ONE aggregation of lineitem feeds both the filter and
  //      the reported total_qty (no second scan, no re-aggregation) ----
  private val q18ish = OracleQuery(
    "j_tpch_q18ish_large_volume_orders",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250.0)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some(s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      total_qty
    FROM orders
      JOIN (SELECT l_orderkey, ${DSUM("l_quantity")} AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING ${DSUM("l_quantity")} > 250.0) big
        ON o_orderkey = big.l_orderkey
      JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  // ---- TPC-H Q21-shape: suppliers who kept orders waiting — the classic
  //      EXISTS (another supplier on the order) + NOT EXISTS (no OTHER
  //      supplier was late) double correlation. Spark-first form: both
  //      correlated subqueries collapse into ONE per-(order,supplier)
  //      aggregation and ONE per-order aggregation that carries the
  //      (bounded: suppliers-per-order) late-supplier set — a single
  //      lineitem scan and two shuffles, where the classic plan joins the
  //      per-supplier relation back against its own per-order rollup and
  //      scans the fact table twice ----
  private val q21ish = OracleQuery(
    "j_tpch_q21ish_waiting_suppliers",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val su = Tables.supplier(s, d)
      val late = col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 100 DAYS")
      val perSupp = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), late.as("late"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("late"))
      perSupp.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          collect_set(when(col("late"), col("l_suppkey"))).as("late_supps"))
        .filter(col("n_supp") > 1 && size(col("late_supps")) === 1)
        .select(element_at(col("late_supps"), 1).as("l_suppkey"))
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    },
    Some("""WITH go AS (
      SELECT l_orderkey, l_suppkey,
        MAX(l_shipdate > o_orderdate + INTERVAL 100 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM go g1 JOIN supplier ON g1.l_suppkey = s_suppkey
    WHERE g1.late
      AND EXISTS (SELECT 1 FROM go g2 WHERE g2.l_orderkey = g1.l_orderkey
        AND g2.l_suppkey <> g1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM go g3 WHERE g3.l_orderkey = g1.l_orderkey
        AND g3.l_suppkey <> g1.l_suppkey AND g3.late)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25"""))

  // ---- TPC-H Q4-shape: priority waiting report — orders in a quarter with
  //      at least one LATE lineitem (shipped >90 days after the order; the
  //      test corpus has no commit/receipt dates, so lateness is
  //      ship-vs-order). The EXISTS must compile to a LEFT SEMI join —
  //      never an inner join + distinct, which would duplicate an order per
  //      late line before deduplicating it back ----
  private val q4ish = OracleQuery(
    "j_tpch_q4ish_priority_waiting",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---- TPC-H Q6-shape: forecasting revenue change — the canonical
  //      scan-filter-aggregate with NO join. Plan property: all three
  //      predicates reach the parquet scan as PushedFilters and the whole
  //      query is one WholeStageCodegen span around one partial/final agg
  //      pair — the minimal possible 100 TB plan (I/O-bound, embarrassingly
  //      parallel, k rows per task to the single exchange) ----
  private val q6ish = OracleQuery(
    "j_tpch_q6ish_forecast_revenue",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity") < 25.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items")),
    Some(s"""SELECT ${DSUM("l_extendedprice * l_discount")} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 25.0"""))

  // ---- TPC-H Q8-shape: national market share — one nation's fraction of a
  //      part-type market's revenue per year, restricted to customers in one
  //      region. Six-way join where every dim that stays small at 100 TB
  //      (nation ×2, region) broadcasts, the type-filtered part side is left
  //      to AQE (part scales linearly — a forced broadcast would OOM), and
  //      the share is a ratio of two exact-DECIMAL sums in ONE aggregation
  //      pass over the joined fact rows ----
  private val q8ish = OracleQuery(
    "j_tpch_q8ish_market_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val p = Tables.part(s, d).filter(col("p_type") === "STANDARD")
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("c_rk") === r("r_regionkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (dsum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0.0))) /
            dsum(rev)).as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_year"))
    },
    Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      ${DSUM("CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
        / ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS mkt_share,
      COUNT(*) AS n_items
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
    WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1"""))

  // ---- TPC-H Q9-shape: product-type profit by nation and year. The test
  //      corpus has no partsupp/supplycost, so cost is proxied as 10% of
  //      retail price × quantity — same dataflow: a name-filtered part dim,
  //      supplier→nation for the grouping key, orders for the year, one
  //      per-row profit expression summed exactly per (nation, year) ----
  private val q9ish = OracleQuery(
    "j_tpch_q9ish_nation_profit",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val su = Tables.supplier(s, d)
      val p = Tables.part(s, d).filter(col("p_name").contains("widget"))
      val n = Tables.nation(s, d)
      val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        col("p_retailprice") * lit(0.1) * col("l_quantity")
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum(profit).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      ${DSUM("l_extendedprice * (1.0 - l_discount) - p_retailprice * 0.1 * l_quantity")}
        AS sum_profit
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))

  // ---- TPC-H Q15-shape: top supplier(s) by quarterly revenue — a grouped
  //      rollup reused as both the ranking relation and the scalar-max
  //      source, ties kept. Plan properties: lineitem aggregates ONCE (the
  //      max reads the rollup, not the fact table) and the one-row max
  //      broadcasts back — never a sort of all suppliers just to take the
  //      head. Exact-DECIMAL revenue makes the equality threshold
  //      deterministic cross-engine ----
  private val q15ish = OracleQuery(
    "j_tpch_q15ish_top_supplier",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("__mx"))
      rev.join(broadcast(mx))
        .filter(col("total_revenue") === col("__mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some(s"""WITH rev AS (
      SELECT l_suppkey,
        ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey"""))

  // ---- k-anonymity audit (QualityChecks.kAnonymityReport/RiskRows,
  //      Sweeney 2002): re-identification exposure over the quasi-
  //      identifier tuple (nation, segment, 500-unit balance band) — the
  //      governance report a dataset release ships beside PII redaction.
  //      The histogram publishes class SIZES only (safe to share); the
  //      risk-rows gate keys by c_custkey so quasi-values never leave the
  //      operator. Exact integer counts → FULL oracle ----
  private def custQuasi(c: org.apache.spark.sql.DataFrame) =
    c.withColumn("bal_band", floor(col("c_acctbal") / 500.0))
  private val kAnonReport = OracleQuery(
    "t_k_anonymity_report",
    (s, d) => graft.operators.QualityChecks
      .kAnonymityReport(custQuasi(Tables.customer(s, d)),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)
      .select(col("class_size").cast("long").as("class_size"),
        col("n_classes"), col("n_rows"), col("at_risk"))
      .orderBy(col("class_size")),
    Some("""WITH cls AS (
      SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 500.0) AS b,
        COUNT(*) AS class_size
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(class_size AS BIGINT) AS class_size,
      CAST(COUNT(*) AS BIGINT) AS n_classes,
      CAST(COUNT(*) * class_size AS BIGINT) AS n_rows,
      class_size < 5 AS at_risk
    FROM cls GROUP BY class_size ORDER BY class_size"""))
  private val kAnonRiskRows = OracleQuery(
    "t_k_anonymity_risk_rows",
    (s, d) => graft.operators.QualityChecks
      .kAnonymityRiskRows(custQuasi(Tables.customer(s, d)),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5,
        idCol = "c_custkey")
      .orderBy(col("c_custkey")),
    Some("""WITH cls AS (
      SELECT c_custkey, COUNT(*) OVER (PARTITION BY c_nationkey,
        c_mktsegment, floor(c_acctbal / 500.0)) AS class_size
      FROM customer
    )
    SELECT c_custkey, CAST(class_size AS BIGINT) AS class_size
    FROM cls WHERE class_size < 5 ORDER BY c_custkey"""))

  // ---- l-diversity audit (QualityChecks.lDiversity*, Machanavajjhala
  //      et al. 2007): k-anonymity's blind spot is attribute disclosure —
  //      a large class whose sensitive value is uniform reveals it for
  //      every member. Quasi = (nation, segment), sensitive = the COARSE
  //      5000-unit balance tier (the column a release would treat as the
  //      secret); a class is at risk when its members span < 3 distinct
  //      tiers. Exact distinct counts → FULL oracle ----
  private def custSensitive(c: org.apache.spark.sql.DataFrame) =
    c.withColumn("bal_tier", floor(col("c_acctbal") / 5000.0))
  private val lDivReport = OracleQuery(
    "t_l_diversity_report",
    (s, d) => graft.operators.QualityChecks
      .lDiversityReport(custSensitive(Tables.customer(s, d)),
        Seq("c_nationkey", "c_mktsegment"), "bal_tier", l = 3)
      .orderBy(col("diversity")),
    Some("""WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(COUNT(DISTINCT floor(c_acctbal / 5000.0)) AS BIGINT)
          AS diversity,
        CAST(COUNT(*) AS BIGINT) AS class_size
      FROM customer GROUP BY 1, 2
    )
    SELECT diversity, CAST(COUNT(*) AS BIGINT) AS n_classes,
      CAST(SUM(class_size) AS BIGINT) AS n_rows,
      diversity < 3 AS at_risk
    FROM cls GROUP BY diversity ORDER BY diversity"""))
  private val lDivRiskRows = OracleQuery(
    "t_l_diversity_risk_rows",
    (s, d) => graft.operators.QualityChecks
      .lDiversityRiskRows(custSensitive(Tables.customer(s, d)),
        Seq("c_nationkey", "c_mktsegment"), "bal_tier", l = 3,
        idCol = "c_custkey")
      .orderBy(col("c_custkey")),
    Some("""WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(COUNT(DISTINCT floor(c_acctbal / 5000.0)) AS BIGINT)
          AS diversity
      FROM customer GROUP BY 1, 2
    )
    SELECT c_custkey, diversity
    FROM customer c JOIN cls USING (c_nationkey, c_mktsegment)
    WHERE diversity < 3 ORDER BY c_custkey"""))

  // ---- t-closeness audit (QualityChecks.tCloseness*, Li, Li &
  //      Venkatasubramanian 2007): the leak l-diversity misses — a class
  //      whose sensitive values are diverse but SKEWED far from the
  //      corpus baseline. Per class, ordered EMD to the global balance-
  //      tier distribution, t = 0.05. Cumulative sums stay in exact
  //      integer counts (window association order cannot drift), each
  //      |cumP − cumQ| crosses the exact-decimal boundary, ÷(m−1) and
  //      the 1e6 quantization happen last → FULL oracle ----
  private val tCloseSql = """WITH c AS (
      SELECT *, floor(c_acctbal / 5000.0) AS v FROM customer
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c
    ), g AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS gc FROM c GROUP BY 1
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m FROM g
    ), cls AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cs
      FROM c GROUP BY 1, 2
    ), cv AS (
      SELECT c_nationkey, c_mktsegment, v, CAST(COUNT(*) AS BIGINT) AS cc
      FROM c GROUP BY 1, 2, 3
    ), grid AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.cs, g.v, g.gc,
        COALESCE(cv.cc, 0) AS cc
      FROM cls CROSS JOIN g
      LEFT JOIN cv ON cv.c_nationkey = cls.c_nationkey
        AND cv.c_mktsegment = cls.c_mktsegment AND cv.v = g.v
    ), cum AS (
      SELECT *,
        SUM(cc) OVER (PARTITION BY c_nationkey, c_mktsegment
          ORDER BY v) AS ccc,
        SUM(gc) OVER (PARTITION BY c_nationkey, c_mktsegment
          ORDER BY v) AS cgc,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey, c_mktsegment
          ORDER BY v) AS rk
      FROM grid
    ), emd AS (
      SELECT c_nationkey, c_mktsegment, MAX(cs) AS class_size,
        CAST(floor(%DSUM% / (m - 1) * 1000000.0) AS BIGINT) AS emd_q
      FROM cum CROSS JOIN tot CROSS JOIN m
      WHERE rk < m GROUP BY c_nationkey, c_mktsegment, m
    )"""
  private def tCloseOracle(tail: String) = Some(
    tCloseSql.replace("%DSUM%",
      DSUM("abs(CAST(ccc AS DOUBLE) / cs - CAST(cgc AS DOUBLE) / n)",
        27, 12)) + tail)
  private val tCloseReport = OracleQuery(
    "t_t_closeness_report",
    (s, d) => graft.operators.QualityChecks
      .tClosenessReport(custSensitive(Tables.customer(s, d)),
        Seq("c_nationkey", "c_mktsegment"), "bal_tier", t = 0.05)
      .orderBy(col("emd_q")),
    tCloseOracle("""
    SELECT emd_q, CAST(COUNT(*) AS BIGINT) AS n_classes,
      CAST(SUM(class_size) AS BIGINT) AS n_rows, emd_q > 50000 AS at_risk
    FROM emd GROUP BY emd_q ORDER BY emd_q"""))
  private val tCloseRiskRows = OracleQuery(
    "t_t_closeness_risk_rows",
    (s, d) => graft.operators.QualityChecks
      .tClosenessRiskRows(custSensitive(Tables.customer(s, d)),
        Seq("c_nationkey", "c_mktsegment"), "bal_tier", t = 0.05,
        idCol = "c_custkey")
      .orderBy(col("c_custkey")),
    tCloseOracle("""
    SELECT c_custkey, emd_q
    FROM customer JOIN emd USING (c_nationkey, c_mktsegment)
    WHERE emd_q > 50000 ORDER BY c_custkey"""))

  override val all: Seq[OracleQuery] = Seq(
    kAnonReport, kAnonRiskRows, lDivReport, lDivRiskRows,
    tCloseReport, tCloseRiskRows,
    p2Parse, lastWinsMerge, pairSample, alignedCounts, aboveCustomerAvg,
    rangeJoin, exactCorr, percentiles, trailingWindow, firstLast,
    scd2Intervals, bootstrapMeans, dataQualityReport, olsTrend, madOutliers,
    stringAgg, groupingSets, q5ish, q3ish, q17ish, q12ish, q19ish,
    q14ish, q22ish, q7ish, q10ish, q13ish, q18ish, q21ish,
    q4ish, q6ish, q8ish, q9ish, q15ish,
    arrayHof, regexpGroups, bagSetOps,
    pivotQuery, unpivotQuery, rankStats, momentsPack, histogram,
    histogramEquidepth, nullSemantics)
}
