package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.DeclaredQuery
import graft.sources.Tables

/** §2.5 — window functions. Every ORDER BY inside a window spec carries a
  * unique tie-break key (event_id / o_orderkey) so frame contents are
  * deterministic across engines. Time-based RANGE frames order by integer
  * epoch-µs on both sides — exact integer frame bounds, no ns/µs drift.
  * win_topk_group is the rank-then-filter shape Spark 4 rewrites to
  * WindowGroupLimitExec (per-partition top-k before the shuffle).
  */
object Windows {

  def defs: Seq[(String, DeclaredQuery)] = Seq(

    "win_rank" -> DeclaredQuery(
      (s, d) => {
        val byPrioUnique = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
        val byPrio = Window.partitionBy("o_custkey").orderBy(col("o_orderpriority"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          row_number().over(byPrioUnique).as("rn"),
          rank().over(byPrio).as("rnk"),
          dense_rank().over(byPrio).as("drnk"))
          .orderBy(col("o_orderkey"))
      },
      Some("SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey) AS rn, " +
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk, " +
        "dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk " +
        "FROM orders ORDER BY o_orderkey")),

    "win_ewma" -> DeclaredQuery(
      // Exponentially-weighted moving average per user over event time —
      // the corintick-domain smoother, via the native Ewma
      // AggregateWindowFunction (expressions/EwmaWin.scala: O(n) running
      // recurrence inside WindowExec's running frame; a relational
      // spelling is an O(n²) triangular self-join). Null ticks carry the
      // previous value (ts_ffill semantics). The oracle is the same
      // recurrence as a DuckDB recursive CTE over per-user row numbers —
      // both engines execute literally `0.2·x + 0.8·e` in binary64, so
      // 6dp-rounded outputs hash-match exactly.
      (s, d) => {
        val e = graft.functions.expressions.EwmaWin.ewmaOver(col("value"), 0.2,
          partitionBy = Seq(col("user_id")), orderBy = Seq(col("ts"), col("event_id")))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), round(e, 6).as("ewma"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("WITH RECURSIVE base AS (SELECT user_id, event_id, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), " +
        "r AS (SELECT user_id, event_id, rn, value AS e FROM base WHERE rn = 1 " +
        "UNION ALL SELECT b.user_id, b.event_id, b.rn, " +
        "CASE WHEN b.value IS NULL THEN r.e WHEN r.e IS NULL THEN b.value " +
        "ELSE 0.2 * b.value + 0.8 * r.e END " +
        "FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1) " +
        "SELECT user_id, event_id, round(e, 6) AS ewma FROM r ORDER BY user_id, event_id"),
      "per-user EWMA of tick values (native running window recurrence)"),

    "win_rolling_slope" -> DeclaredQuery(
      // Rolling regression slope — the trend detector over the last 10
      // ticks per series: least-squares slope from windowed sufficient
      // statistics (n, Σx, Σy, Σxy, Σx²) with x = the row ordinal, so
      // Σx and Σx² are EXACT small integers and the denominator
      // n·Σx²−(Σx)² is exact (825 for every full 10-row frame) —
      // nullif guards the single-row frames. ONE window pass computes
      // all five statistics over one (user) sort; O(1)-magnitude
      // numerators + 6dp rounding absorb the engines' different
      // frame-summation orders (the win_movavg precedent).
      (s, d) => {
        val wRn = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wF = wRn.rowsBetween(-9, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("x", row_number().over(wRn).cast("double"))
          .withColumn("n", count(lit(1)).over(wF).cast("double"))
          .withColumn("sx", sum(col("x")).over(wF))
          .withColumn("sy", sum(col("value")).over(wF))
          .withColumn("sxy", sum(col("x") * col("value")).over(wF))
          .withColumn("sx2", sum(col("x") * col("x")).over(wF))
          .select(col("user_id"), col("event_id"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              nullif(col("n") * col("sx2") - col("sx") * col("sx"), lit(0.0)), 6)
              .as("slope"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("WITH t AS (SELECT user_id, event_id, value, " +
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS DOUBLE) AS x FROM events), " +
        "w AS (SELECT user_id, event_id, " +
        "CAST(count(*) OVER fr AS DOUBLE) AS n, " +
        "sum(x) OVER fr AS sx, sum(value) OVER fr AS sy, " +
        "sum(x * value) OVER fr AS sxy, sum(x * x) OVER fr AS sx2 " +
        "FROM t WINDOW fr AS (PARTITION BY user_id ORDER BY x " +
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) " +
        "SELECT user_id, event_id, " +
        "round((n * sxy - sx * sy) / nullif(n * sx2 - sx * sx, 0.0), 6) + 0.0 AS slope " +
        "FROM w ORDER BY user_id, event_id"),
      "rolling least-squares slope from windowed sufficient statistics (exact integer denominator)"),

    "win_cume" -> DeclaredQuery(
      // Distribution functions: percent_rank / cume_dist. The window
      // ORDER BY carries the unique c_custkey tie-break so both engines
      // compute identical fractions; 6dp rounding absorbs nothing here
      // (the fractions are exact ratios) but keeps the discipline uniform.
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.customer(s, d).select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
          .orderBy(col("c_custkey"))
      },
      Some("SELECT c_custkey, c_mktsegment, c_acctbal, " +
        "round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS pr, " +
        "round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS cd " +
        "FROM customer ORDER BY c_custkey"),
      "distribution window functions: percent_rank + cume_dist"),

    "win_lead_nth" -> DeclaredQuery(
      // lead with an explicit default + nth_value over the full frame.
      // The window order carries the unique c_custkey tie-break.
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.customer(s, d).select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          lead(col("c_acctbal"), 2, -1.0).over(w).as("lead2"),
          nth_value(col("c_acctbal"), 3).over(wf).as("third_low"))
          .orderBy(col("c_custkey"))
      },
      Some("SELECT c_custkey, c_mktsegment, c_acctbal, " +
        "lead(c_acctbal, 2, -1.0) OVER w AS lead2, " +
        "nth_value(c_acctbal, 3) OVER wf AS third_low FROM customer " +
        "WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), " +
        "wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY c_custkey"),
      "lead with default + nth_value over the full frame"),

    "win_lag" -> DeclaredQuery(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, user_id, ts, epoch_us(ts) - epoch_us(lag(ts, 1) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us FROM events ORDER BY event_id")),

    "win_movavg_rows" -> DeclaredQuery(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-3, 0)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          round(avg(col("value")).over(w), 6).as("mavg"))
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, user_id, ts, round(avg(value) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mavg " +
        "FROM events ORDER BY event_id")),

    "win_movavg_range" -> DeclaredQuery(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, 0L)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          round(avg(col("value")).over(w), 6).as("mavg_1h"))
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, user_id, ts, round(avg(value) OVER (PARTITION BY user_id " +
        "ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6) AS mavg_1h " +
        "FROM events ORDER BY event_id")),

    "win_running" -> DeclaredQuery(
      // Running sum over integer cents: exact at any depth — no float
      // accumulation-order hazard between engines.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("cents", round(col("value") * 100, 0).cast("long"))
          .select(col("event_id"), col("user_id"), col("ts"),
            sum(col("cents")).over(w).as("run_cents"))
          .orderBy(col("event_id"))
      },
      // CAST the window sum: DuckDB sum(BIGINT) widens to HUGEINT.
      Some("SELECT event_id, user_id, ts, CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS BIGINT) AS run_cents FROM events ORDER BY event_id")),

    "win_ntile" -> DeclaredQuery(
      // ntile quartiles + frame-bounded first/last values, unique order.
      (s, d) => {
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("l_extendedprice")).over(wf).as("grp_min"),
          last(col("l_extendedprice")).over(wf).as("grp_max"))
          // (okey, line) is not unique — extend to a total output order
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_extendedprice"), col("quartile"))
      },
      Some("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_returnflag, " +
        "l_extendedprice, CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
        "first_value(l_extendedprice) OVER wf AS grp_min, " +
        "last_value(l_extendedprice) OVER wf AS grp_max FROM lineitem " +
        "WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber), " +
        "wf AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY l_orderkey, l_linenumber, l_returnflag, l_extendedprice, quartile")),

    "win_topk_group" -> DeclaredQuery(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn")),

    "win_pareto" -> DeclaredQuery(
      // Pareto / 80-20 concentration per event type: users ranked by
      // exact-cents spend, running cumulative share, and how many top
      // users cover 80% of the type's volume. The crossing test is PURE
      // INTEGER (5·cum ≥ 4·total ⟺ cum/total ≥ 0.8) so no float
      // boundary can flip a rank between engines; the displayed share is
      // one rounded division per row. Two aggregates + one window over
      // the same (event_type) clustering; output is #types rows.
      (s, d) => {
        val perUser = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .groupBy("event_type", "user_id")
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        val w = Window.partitionBy("event_type")
          .orderBy(desc("cents"), asc("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy("event_type")
        perUser
          .withColumn("__cum", sum(col("cents")).over(w))
          .withColumn("__tot", sum(col("cents")).over(tot))
          .withColumn("__rk", row_number().over(
            Window.partitionBy("event_type").orderBy(desc("cents"), asc("user_id"))))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            min(when(col("__cum") * 5 >= col("__tot") * 4, col("__rk")))
              .as("users_to_80pct"),
            max(col("__tot")).as("total_cents"))
          .orderBy(col("event_type"))
      },
      Some("WITH pu AS (SELECT event_type, user_id, " +
        "CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
        "r AS (SELECT event_type, cents, " +
        "CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY cents DESC, user_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
        "CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS tot, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY cents DESC, user_id) AS rk FROM pu) " +
        "SELECT event_type, count(*) AS n_users, " +
        "min(CASE WHEN cum * 5 >= tot * 4 THEN rk END) AS users_to_80pct, " +
        "max(tot) AS total_cents FROM r GROUP BY event_type ORDER BY event_type"),
      "Pareto concentration: top users covering 80% of each type's exact-cents volume")
  )
}
