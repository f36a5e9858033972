package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.DeclaredQuery
import graft.sources.Tables

/** §2.4 — aggregations. All hash aggregates with map-side partial
  * aggregation (HashAggregateExec partial→final), so shuffle volume is
  * #groups, not #rows — the property that keeps these viable at 100 TB.
  * OHLC resampling uses min_by/max_by over (ts, event_id) struct ordering
  * (deterministic tie-break by unique event_id), the built-in replacement
  * for corintick-domain bar resampling.
  */
object Aggregates {

  def defs: Seq[(String, DeclaredQuery)] = Seq(

    "agg_group" -> DeclaredQuery(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base, " +
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc, " +
        "round(avg(l_quantity), 6) AS avg_qty, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    "agg_distinct" -> DeclaredQuery(
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    "agg_hll" -> DeclaredQuery(
      // HLL++ sketch: mergeable, O(1) memory per group — the 100 TB
      // distinct-count path. Implementations differ across engines, so no
      // SQL oracle; HllSpec asserts <5% error vs exact at sf0.01.
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type"),
      None,
      "approximate distinct via HyperLogLog++"),

    "agg_hll_union" -> DeclaredQuery(
      // Sketch REAGGREGATION — the pattern that makes 100 TB rollup
      // tables work: build a Datasketches HLL sketch per (type, day),
      // persist-shaped (binary column), then hll_union_agg the daily
      // sketches to per-type totals WITHOUT touching raw data again. A
      // distinct-count rollup is not reaggregatable from counts (days
      // overlap users); sketches merge losslessly. No SQL oracle
      // (sketch binaries are engine-specific); HllSpec bounds the
      // estimate against the exact distinct.
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("__sk"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            hll_sketch_estimate(hll_union_agg(col("__sk"))).as("approx_users"))
          .orderBy("event_type")
      },
      None,
      "HLL sketch union: daily sketches reaggregate to totals without a rescan"),

    "agg_rollup" -> DeclaredQuery(
      // Spelled in SQL: Dataset.rollup + by-name orderBy trips Spark's
      // ambiguous-column check (the Expand node re-emits the grouping
      // attributes). The SQL path resolves cleanly and plans identically.
      // nation/region sit far under the broadcast threshold → two
      // BroadcastHashJoins, zero shuffles of the customer side.
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_customer")
        Tables.nation(s, d).createOrReplaceTempView("graft_nation")
        Tables.region(s, d).createOrReplaceTempView("graft_region")
        s.sql("SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) AS bal " +
          "FROM graft_customer JOIN graft_nation ON c_nationkey = n_nationkey " +
          "JOIN graft_region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name) " +
          "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST")
      },
      // + 0.0: c_acctbal can be negative, so a group sum can round to
      // DuckDB's -0.0 (Spark's round never emits a signed zero)
      Some("SELECT r_name, n_name, count(*) AS n, round(sum(c_acctbal), 2) + 0.0 AS bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST")),

    "agg_cube" -> DeclaredQuery(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders")
        Tables.customer(s, d).createOrReplaceTempView("graft_customer")
        s.sql("SELECT c_mktsegment, o_orderstatus, count(*) AS n, " +
          "round(sum(o_totalprice), 2) AS total " +
          "FROM graft_orders JOIN graft_customer ON o_custkey = c_custkey " +
          "GROUP BY CUBE(c_mktsegment, o_orderstatus) " +
          "ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST")
      },
      Some("SELECT c_mktsegment, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY CUBE(c_mktsegment, o_orderstatus) " +
        "ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST")),

    "agg_grouping_sets" -> DeclaredQuery(
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
        s.sql("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n " +
          "FROM graft_lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
          "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
      },
      Some("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")),

    "agg_ohlc" -> DeclaredQuery(
      // Resample to 1-hour OHLC bars — the canonical corintick-domain
      // aggregation (the reference stores bars; clients resample).
      // open/close via min_by/max_by on (ts, event_id) struct ordering:
      // deterministic because event_id is unique.
      (s, d) => {
        val aggs = graft.Q.ohlcAggs(col("ts"), col("event_id"), col("value")) ++
          Seq(count(lit(1)).as("n"), round(sum("value"), 4).as("vol"))
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("bar_ts"), col("event_type"))
          .agg(aggs.head, aggs.tail: _*)
          .orderBy("bar_ts", "event_type")
      },
      Some("SELECT date_trunc('hour', ts) AS bar_ts, event_type, " +
        "first(value ORDER BY ts, event_id) AS open, max(value) AS high, min(value) AS low, " +
        "last(value ORDER BY ts, event_id) AS close, count(*) AS n, round(sum(value), 4) AS vol " +
        "FROM events GROUP BY 1, 2 ORDER BY bar_ts, event_type")),

    "agg_percentile" -> DeclaredQuery(
      // Exact interpolated percentiles (≙ DuckDB `quantile_cont`) via the
      // native one-pass PercentilesAgg: all three order statistics from
      // ONE primitive-double buffer + single sort per group — Spark's
      // builtin `percentile` runs a boxed OpenHashMap per percentile
      // column (measured 5.7s → 1.1s warm at sf0.1). The approximate
      // scale path is percentile_approx (sketch-mergeable like agg_hll);
      // exact is declared because it is oracle-checkable.
      (s, d) => {
        import org.apache.spark.sql.GraftShim
        val ps = GraftShim.column(graft.functions.expressions
          .PercentilesAgg(GraftShim.expression(col("l_extendedprice")),
            Seq(0.5, 0.95, 0.99)).toAggregateExpression())
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(ps.as("__ps"))
          .select(col("l_returnflag"),
            round(element_at(col("__ps"), 1), 6).as("p50"),
            round(element_at(col("__ps"), 2), 6).as("p95"),
            round(element_at(col("__ps"), 3), 6).as("p99"))
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 6) AS p50, " +
        "round(quantile_cont(l_extendedprice, 0.95), 6) AS p95, " +
        "round(quantile_cont(l_extendedprice, 0.99), 6) AS p99 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    "agg_percentile_approx" -> DeclaredQuery(
      // The 100 TB percentile path: percentile_approx's Greenwald-Khanna
      // sketch is MERGEABLE — partial sketches combine map-side and
      // across partitions with bounded rank error (≤ n/accuracy), so the
      // shuffle carries one sketch per group instead of every value,
      // unlike exact percentiles which must see the full distribution.
      // No DuckDB oracle (sketch internals aren't portable, same family
      // as agg_hll); PercentileApproxSpec bounds the error vs the exact
      // agg_percentile twin.
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))
        .orderBy("l_returnflag"),
      None,
      "approximate percentiles via mergeable GK sketch (scale twin of agg_percentile)"),

    "agg_mode" -> DeclaredQuery(
      // Mode (most frequent value) per group with a DETERMINISTIC
      // tie-break — Spark's and DuckDB's builtin mode() both leave ties
      // arbitrary, so the portable spelling is count → rank, which is
      // also the shape that scales (two hash aggregates + a
      // WindowGroupLimit-eligible rank filter; builtin mode keeps a
      // per-group value map).
      (s, d) => {
        val c = Tables.orders(s, d)
          .groupBy("o_orderpriority", "o_orderstatus").agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("o_orderpriority")
          .orderBy(desc("n"), asc("o_orderstatus"))
        c.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
          .select(col("o_orderpriority"), col("o_orderstatus").as("mode_status"), col("n"))
          .orderBy("o_orderpriority")
      },
      Some("WITH c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n " +
        "FROM orders GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority " +
        "ORDER BY n DESC, o_orderstatus) AS rnk FROM c) " +
        "SELECT o_orderpriority, o_orderstatus AS mode_status, n FROM r " +
        "WHERE rnk = 1 ORDER BY o_orderpriority"),
      "deterministic mode per group (count + rank, portable tie-break)"),

    "agg_pivot" -> DeclaredQuery(
      // Pivot with an EXPLICIT value list: omitting it costs an extra
      // distinct job over the full table at scale and makes the output
      // schema data-dependent. Fixed values → one hash aggregate, schema
      // known at plan time. Absent combinations are null → coalesce(0)
      // so both engines emit the same zeros.
      (s, d) => {
        val p = Tables.events(s, d)
          .groupBy("user_id")
          .pivot("event_type", Seq("view", "click", "signup", "purchase", "error"))
          .count()
        p.select(col("user_id") +:
            Seq("view", "click", "signup", "purchase", "error")
              .map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy(col("user_id"))
      },
      Some("SELECT user_id, " +
        "count(*) FILTER (WHERE event_type = 'view') AS view, " +
        "count(*) FILTER (WHERE event_type = 'click') AS click, " +
        "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (WHERE event_type = 'error') AS error " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
      "pivot events to per-user counts by event_type (fixed value list)"),

    "agg_stats" -> DeclaredQuery(
      // Statistical moments & bivariate aggregates. Magnitudes are kept
      // small (quantity 1..50, discount 0..0.1) so the engines' partial-
      // merge float orderings agree well inside the 6dp rounding.
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd_qty, " +
        "round(var_samp(l_discount), 6) AS var_disc, " +
        "round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qp, " +
        "round(covar_samp(l_quantity, l_discount), 6) + 0.0 AS cov_qd, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      "statistical aggregates: stddev/variance/correlation/covariance"),

    "agg_skew" -> DeclaredQuery(
      // Higher moments (skewness, excess kurtosis) WITHOUT the engines'
      // built-ins: Spark's skewness() is the population g1 while DuckDB's
      // is the bias-corrected sample G1 — they can never hash-match. Both
      // sides instead aggregate EXACT integer power sums (quantity is
      // integral, s4 ≤ 50^4·n ≪ 2^63) and derive the moments with the
      // SAME double spelling, so the floats are bit-identical before the
      // defensive 6dp rounding. Map-side partial sums of longs — the
      // cheapest possible two-phase aggregate at any scale.
      (s, d) => {
        val q = col("l_quantity").cast("long")
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(sum(q).as("s1"), sum(q * q).as("s2"),
            sum(q * q * q).as("s3"), sum(q * q * q * q).as("s4"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            // nullif guards the zero-variance group (constant quantity):
            // pow(0, 1.5) = 0.0 would raise DIVIDE_BY_ZERO under ANSI.
            expr("round((CAST(s3 AS DOUBLE)/n - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n) + 2.0*pow(CAST(s1 AS DOUBLE)/n, 3.0)) " +
              "/ nullif(pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2.0), 1.5), 0.0), 6)").as("skew"),
            expr("round((CAST(s4 AS DOUBLE)/n - 4.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n) + 6.0*pow(CAST(s1 AS DOUBLE)/n, 2.0)*(CAST(s2 AS DOUBLE)/n) - 3.0*pow(CAST(s1 AS DOUBLE)/n, 4.0)) " +
              "/ nullif(pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2.0), 2.0), 0.0) - 3.0, 6)").as("kurt"),
            col("n"))
          .orderBy("l_returnflag")
      },
      Some("WITH m AS (SELECT l_returnflag, " +
        "sum(CAST(l_quantity AS BIGINT)) AS s1, " +
        "sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2, " +
        "sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s3, " +
        "sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4, " +
        "count(*) AS n FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, " +
        "round((CAST(s3 AS DOUBLE)/n - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n) + 2.0*pow(CAST(s1 AS DOUBLE)/n, 3.0)) " +
        "/ nullif(pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2.0), 1.5), 0.0), 6) + 0.0 AS skew, " +
        "round((CAST(s4 AS DOUBLE)/n - 4.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n) + 6.0*pow(CAST(s1 AS DOUBLE)/n, 2.0)*(CAST(s2 AS DOUBLE)/n) - 3.0*pow(CAST(s1 AS DOUBLE)/n, 4.0)) " +
        "/ nullif(pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2.0), 2.0), 0.0) - 3.0, 6) + 0.0 AS kurt, " +
        "n FROM m ORDER BY l_returnflag"),
      "skewness + excess kurtosis from exact integer power sums (engine built-ins use incompatible estimators)"),

    "agg_vwap" -> DeclaredQuery(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 6)
          .as("vwap"),
          round(sum("l_quantity"), 2).as("volume"))
        .orderBy("l_partkey"),
      Some("SELECT l_partkey, round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS vwap, " +
        "round(sum(l_quantity), 2) AS volume FROM lineitem GROUP BY l_partkey ORDER BY l_partkey")),

    "agg_salted" -> DeclaredQuery(
      // Two-phase salted aggregation (graft.Q.saltedAgg): phase 1 on
      // (key, salt) spreads a hot key over 16 reducers, phase 2 merges
      // partials per key. sum/count are algebraic so the composition is
      // exact — the oracle is the PLAIN aggregate. l_returnflag has 3
      // values over 60k rows at sf0.01: maximal skew, the exact shape
      // where one-reducer-per-key dies at 100 TB.
      (s, d) => graft.Q.saltedAgg(
        Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
        keys = Seq("l_returnflag"), buckets = 16,
        partials = Seq(sum(col("l_quantity")).as("__s"), count(lit(1)).as("__c")),
        merges = Seq(round(sum(col("__s")), 2).as("sum_qty"),
          sum(col("__c")).as("n")))
        .orderBy(col("l_returnflag")),
      Some("SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      "two-phase salted aggregation (16 buckets) — equals the plain aggregate"),

    "agg_cond" -> DeclaredQuery(
      // Conditional / boolean aggregation: FILTER-style counts and
      // bool_and/bool_or — all partial-merge-able, one hash aggregate.
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(count(when(col("o_totalprice") > 200000.0, 1)).as("n_big"),
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
          bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"))
        .orderBy(col("o_orderstatus")),
      Some("SELECT o_orderstatus, count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big, " +
        "count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent, " +
        "bool_and(o_totalprice > 1000.0) AS all_over_1k, " +
        "bool_or(o_totalprice > 400000.0) AS any_over_400k " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
      "conditional counts + bool_and/bool_or per group"),

    "agg_collect" -> DeclaredQuery(
      // List aggregation surfaced as a SORTED joined string: collect_list
      // order is nondeterministic across partitions, so the sort inside
      // the row (not the shuffle) restores determinism, and the string
      // form keeps the driver's pandas comparator happy (arrays are
      // unhashable there — the round-2 fn_array lesson).
      (s, d) => Tables.orders(s, d)
        .filter(col("o_custkey") <= 100)
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_list(col("o_orderpriority"))), "|").as("prios"),
          count(lit(1)).as("n"))
        .orderBy(col("o_custkey")),
      Some("SELECT o_custkey, array_to_string(list_sort(list(o_orderpriority)), '|') AS prios, " +
        "count(*) AS n FROM orders WHERE o_custkey <= 100 " +
        "GROUP BY o_custkey ORDER BY o_custkey"),
      "collect_list → array_sort → string join (deterministic list agg)"),

    "agg_hist" -> DeclaredQuery(
      // Fixed-width histogram — distribution profiling as ONE hash
      // aggregate whose output is #buckets rows regardless of input
      // volume (the 100 TB way to look at a column; contrast a global
      // sort/percentile). Bucketing is floor integer division spelled
      // identically on both engines (floor BEFORE the int cast: DuckDB's
      // double→int cast ROUNDS); the share-of-total ratio reuses the
      // aggregate's own output (a #buckets-row window, not a second scan).
      (s, d) => {
        val hist = Tables.lineitem(s, d)
          .groupBy(floor(col("l_extendedprice") / 5000.0).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
        hist.withColumn("lo", (col("bucket") * 5000.0).cast("double"))
          .withColumn("share",
            round(col("n").cast("double") / sum(col("n")).over(Window.partitionBy()), 6))
          .select(col("bucket"), col("lo"), col("n"), col("share"))
          .orderBy(col("bucket"))
      },
      Some("WITH h AS (SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket, " +
        "count(*) AS n FROM lineitem GROUP BY 1) " +
        "SELECT bucket, CAST(bucket * 5000.0 AS DOUBLE) AS lo, n, " +
        "round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6) AS share " +
        "FROM h ORDER BY bucket"),
      "fixed-width histogram: floor-div bucketing + share of total"),

    "dq_profile" -> DeclaredQuery(
      // Data-quality profile — the Deequ-style ingestion gate: row count,
      // per-column null counts, numeric extents and a low-cardinality
      // distinct count, all in ONE pass over the table (one partial+final
      // aggregate, no per-metric scans). The single-row result is what a
      // pipeline asserts invariants against before accepting a batch.
      (s, d) => Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").isNull.cast("long")).as("qty_nulls"),
          sum(col("l_discount").isNull.cast("long")).as("disc_nulls"),
          round(min(col("l_quantity")), 2).as("qty_min"),
          round(max(col("l_quantity")), 2).as("qty_max"),
          round(min(col("l_extendedprice")), 2).as("price_min"),
          round(max(col("l_extendedprice")), 2).as("price_max"),
          countDistinct(col("l_returnflag")).as("flag_distinct"),
          min(col("l_shipdate")).as("ship_min"),
          max(col("l_shipdate")).as("ship_max"))
        .orderBy(col("n_rows")),
      Some("SELECT count(*) AS n_rows, " +
        "CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_nulls, " +
        "CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS disc_nulls, " +
        "round(min(l_quantity), 2) AS qty_min, round(max(l_quantity), 2) AS qty_max, " +
        "round(min(l_extendedprice), 2) AS price_min, round(max(l_extendedprice), 2) AS price_max, " +
        "count(DISTINCT l_returnflag) AS flag_distinct, " +
        "min(l_shipdate) AS ship_min, max(l_shipdate) AS ship_max " +
        "FROM lineitem ORDER BY n_rows"),
      "one-pass data-quality profile: counts, null counts, extents, cardinality"),

    "dq_constraints" -> DeclaredQuery(
      // Rule-based constraint suite (the Deequ `Check` analog to
      // dq_profile's analyzers): each rule reduces to a violation COUNT,
      // so the result is #rules rows at any scale. Same-table rules
      // share one aggregate pass; referential rules are anti-join
      // counts (the orders→customer probe broadcasts the key side,
      // lineitem→orders stays a shuffled anti equi-join AQE can
      // re-plan). A pipeline gates batch acceptance on `pass`.
      (s, d) => {
        val e = Tables.events(s, d).agg(
          (count(lit(1)) - countDistinct(col("event_id"))).as("event_id_unique"),
          sum(col("ts").isNull.cast("long")).as("ts_not_null"))
        val docs = Tables.documents(s, d).agg(
          sum((length(trim(col("text"))) === 0).cast("long")).as("doc_text_nonempty"))
        val lifk = Tables.lineitem(s, d).select("l_orderkey")
          .join(Tables.orders(s, d).select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("lineitem_orders_fk"))
        val ofk = Tables.orders(s, d).select("o_custkey")
          .join(broadcast(Tables.customer(s, d).select("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("orders_customer_fk"))
        def rules(df: org.apache.spark.sql.DataFrame) = {
          val cols = df.columns
          df.select(explode(array(cols.map(c =>
            struct(lit(c).as("rule"), col(c).as("violations"))): _*)).as("r"))
            .select(col("r.rule"), col("r.violations"))
        }
        rules(e).union(rules(docs)).union(rules(lifk)).union(rules(ofk))
          .withColumn("pass", col("violations") === 0L)
          .orderBy(col("rule"))
      },
      Some("SELECT rule, violations, violations = 0 AS pass FROM (" +
        "SELECT 'event_id_unique' AS rule, count(*) - count(DISTINCT event_id) AS violations FROM events " +
        "UNION ALL SELECT 'ts_not_null', CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events " +
        "UNION ALL SELECT 'doc_text_nonempty', CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM documents " +
        // NOT EXISTS, not NOT IN: left_anti's NULL-key semantics (a
        // null FK row IS an orphan; a null inner key changes nothing)
        // match NOT EXISTS — NOT IN goes UNKNOWN on either null.
        "UNION ALL SELECT 'lineitem_orders_fk', count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey) " +
        "UNION ALL SELECT 'orders_customer_fk', count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)" +
        ") ORDER BY rule"),
      "rule-based data-quality checks: uniqueness, null, emptiness, referential"),

    "agg_entropy" -> DeclaredQuery(
      // Shannon entropy of each user's event-type distribution — the
      // behavioral-diversity metric (and, on corpora, the dataset-
      // diversity metric). Counts collapse to #users × #types first
      // (map-side combined), so RAW events shuffle once; the per-user
      // window then re-keys only the tiny counts table (hash(user,
      // type) does not satisfy ClusteredDistribution(user), so this
      // second, counts-sized exchange is real — and irrelevant at any
      // scale). -Σ p·ln p has ≤ #types O(1)-magnitude summands — 6dp
      // rounding absorbs ordering noise; the oracle's `+ 0.0` clears
      // DuckDB's signed zero for single-type users (-0.0, which
      // Spark's round never emits).
      (s, d) => {
        val counts = Tables.events(s, d)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("__n"))
        val w = Window.partitionBy("user_id")
        counts
          .withColumn("__tot", sum(col("__n")).over(w))
          .withColumn("__p", col("__n").cast("double") / col("__tot").cast("double"))
          .groupBy("user_id")
          .agg(round(-sum(col("__p") * log(col("__p"))), 6).as("entropy"),
            count(lit(1)).cast("long").as("n_types"))
          .orderBy(col("user_id"))
      },
      Some("WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2), " +
        "p AS (SELECT user_id, CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY user_id) AS DOUBLE) AS p FROM c) " +
        "SELECT user_id, round(-sum(p * ln(p)), 6) + 0.0 AS entropy, count(*) AS n_types " +
        "FROM p GROUP BY user_id ORDER BY user_id"),
      "Shannon entropy per user's event-type distribution (one event shuffle)")
  )
}
