package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.DeclaredQuery
import graft.sources.Tables

/** Corintick-domain time-series operators (SURVEY §2.5/§4.3): as-of join,
  * forward-fill (LOCF), resampled returns.
  *
  * The as-of join is the quintessential tick-data operator Spark lacks.
  * Strategy (SURVEY §4.3 A): tag + union both sides, one window pass per
  * key — a SINGLE shuffle on the key column and a linear scan, instead of
  * a per-row subquery or a range cross-join. At 100 TB this is the only
  * shape that survives: shuffle volume = |left|+|right|, state = one row
  * of carried right-columns per partition stream.
  */
object TimeSeries {

  /** Generic as-of join: for each left row, the latest right row of the
    * same key with `right.ts <= left.ts` (left-outer: unmatched left rows
    * keep nulls). Ties on ts are broken by `rightTieBreak` (latest wins).
    *
    * `forward = true` flips the direction: the EARLIEST right row with
    * `right.ts >= left.ts` (ties: smallest tie-break wins) — same single
    * shuffle + linear pass, just a reversed sort order.
    *
    * `tolerance` bounds match staleness (pandas `merge_asof(tolerance=)`
    * semantics): a match farther than `tolerance` from the left ts is
    * nulled out. Post-filtering the single-pass result is equivalent to
    * restricting candidates to the window, because the as-of winner
    * inside [ts-tol, ts] is the same row as the unbounded winner whenever
    * one exists — so the scale shape is unchanged (no extra pass).
    */
  /** Shared tagged-union prep for the window-based as-of family: both
    * sides keyed, timestamped as `__ts`, side-tagged, with the non-key
    * payload packed into `__l`/`__r` structs (null-cast on the other
    * side). Returned as (union input, key cols, left cols, right cols,
    * tie-break cols) so every variant sorts/selects the same shapes.
    */
  private def asofPrep(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       rightTieBreak: Seq[String])
      : (DataFrame, Seq[Column], Array[String], Array[String], Seq[Column]) = {
    val leftCols = left.columns.filterNot(keys.contains)
    val rightCols = right.columns.filterNot(keys.contains)
    val keyCols: Seq[Column] = keys.map(col)
    val lPrep = left.select(keyCols ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(rightCols.map(col): _*).schema).as("__r")): _*)
    val rPrep = right.select(keyCols ++ Seq(
      col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(left.select(leftCols.map(col): _*).schema).as("__l"),
      struct(rightCols.map(col): _*).as("__r")): _*)
    val tieCols = rightTieBreak.map(c => col("__r").getField(c))
    (lPrep.unionByName(rPrep), keyCols, leftCols, rightCols, tieCols)
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightTieBreak: Seq[String] = Seq.empty,
               forward: Boolean = false,
               tolerance: Option[Column] = None): DataFrame = {
    val (union, keyCols, leftCols, rightCols, tieCols) =
      asofPrep(left, right, keys, leftTs, rightTs, rightTieBreak)
    // forward: descending ts puts later rows first, so "last right above
    // me" is the closest FOLLOWING row; equal-ts tie-breaks are reversed
    // so the smallest wins (mirror-image of the backward ordering)
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side")) ++ tieCols.map(_.desc)
      else Seq(col("__ts"), col("__side")) ++ tieCols
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val raw = union
      .withColumn("__rlast", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        val mTs = col("__rlast").getField(rightTs)
        val inTol = if (forward) mTs <= col("__ts") + tol
                    else mTs >= col("__ts") - tol
        raw.withColumn("__rlast", when(inTol, col("__rlast")))
      case None => raw
    }
    bounded.select(keyCols ++
      leftCols.map(c => col("__l").getField(c).as(c)) ++
      rightCols.map(c => col("__rlast").getField(c).as(c)): _*)
  }

  /** Nearest-direction as-of join (pandas `merge_asof(direction=
    * 'nearest')`): for each left row, the right row of the same key with
    * the smallest |right.ts - left.ts|; ties between an equally-near
    * preceding and following candidate go BACKWARD (the preceding row),
    * matching the at-or-before bias of the plain as-of. Same union
    * strategy as [[asofJoin]], but BOTH directions are carried in the one
    * partitioned stream: two window frames (last-preceding over the
    * ascending order, first-following over the descending order) share a
    * single shuffle on the key columns, then a per-row CASE picks the
    * nearer candidate — shuffle volume |left|+|right| and two linear
    * sorts, never a per-row subquery.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    val (union, keyCols, leftCols, rightCols, tieCols) =
      asofPrep(left, right, keys, leftTs, rightTs, rightTieBreak)
    val ordBwd = Seq(col("__ts"), col("__side")) ++ tieCols
    val ordFwd = Seq(col("__ts").desc, col("__side")) ++ tieCols.map(_.desc)
    val wBwd = Window.partitionBy(keyCols: _*).orderBy(ordBwd: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keyCols: _*).orderBy(ordFwd: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = union
      .withColumn("__rprev", last(col("__r"), ignoreNulls = true).over(wBwd))
      .withColumn("__rnext", last(col("__r"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
    val dPrev = unix_micros(col("__ts")) - unix_micros(col("__rprev").getField(rightTs))
    val dNext = unix_micros(col("__rnext").getField(rightTs)) - unix_micros(col("__ts"))
    val chosen = when(col("__rprev").isNull, col("__rnext"))
      .when(col("__rnext").isNull, col("__rprev"))
      .when(dNext < dPrev, col("__rnext"))
      .otherwise(col("__rprev"))
    tagged.withColumn("__rbest", chosen)
      .select(keyCols ++
        leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightCols.map(c => col("__rbest").getField(c).as(c)): _*)
  }

  /** As-of join through the CUSTOM OPERATOR path (graft.plans.AsofJoin*):
    * builds the [[graft.plans.AsofJoinPlan]] logical node directly; the
    * injected strategy plans the streaming-merge exec. Works on ANY
    * session: if [[graft.GraftExtensions]] isn't installed, the strategy
    * is added through the public `spark.experimental.extraStrategies`
    * hook. Key columns must be distinctly named across the two sides
    * (the node exposes both schemas unchanged). `forward = true` flips
    * to first-at-or-after semantics (see [[graft.plans.AsofJoinExec]]).
    * NULL timestamps follow SQL comparison semantics: a null-ts left row
    * matches nothing (null-extended output) and a null-ts right row is
    * never an as-of candidate — exactly what the oracle's correlated
    * `v.ts <= p.ts` subquery yields.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame,
                     leftKeys: Seq[String], rightKeys: Seq[String],
                     leftTs: String, rightTs: String,
                     rightTieBreak: Seq[String] = Seq.empty,
                     toleranceMicros: Option[Long] = None,
                     forward: Boolean = false,
                     nearest: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val session = left.sparkSession
    // Registration is guarded per-session: `extraStrategies` is a plain
    // read-modify-write var, so concurrent callers could otherwise lose an
    // update or append twice. (If GraftExtensions is also installed the
    // strategy exists in the extensions' separate strategy list too — that
    // duplicate is harmless: both plan AsofJoinPlan to the identical exec
    // and the planner takes the first non-empty answer.)
    session.experimental.synchronized {
      if (!session.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
        session.experimental.extraStrategies =
          session.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    }
    val lp = GraftShim.logicalPlan(left)
    val rp = GraftShim.logicalPlan(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    GraftShim.ofRows(left.sparkSession, graft.plans.AsofJoinPlan(
      lp, rp, leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTs), attr(rp, rightTs), rightTieBreak.map(attr(rp, _)),
      toleranceMicros, forward, nearest))
  }

  /** Hourly close bars per series — the shared resample stage of the
    * bar-indicator family (ts_bollinger / ts_rsi). close = max_by over
    * the unique (ts, event_id) struct: a PARTIAL-aggregatable spelling,
    * so each input partition collapses its ticks to one candidate per
    * (series, hour) map-side and only bar-sized partials reach the
    * exchange — at 100 TB the raw tick volume never shuffles. (The
    * row_number()=1 idiom ts_m4 uses needs the full ticks sorted inside
    * each bar partition first; fine for min/max/first/last together,
    * strictly worse when close alone is needed.)
    */
  private def hourlyCloseBars(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bar_ts"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))

  /** DuckDB twin of [[hourlyCloseBars]]: ordered-aggregate `last` over
    * the same unique (ts, event_id) order — tie-free, so both engines
    * pick the identical closing tick. */
  private val HourlyCloseBarsSql: String =
    "bars AS (SELECT event_type, date_trunc('hour', ts) AS bar_ts, " +
      "last(value ORDER BY ts, event_id) AS close " +
      "FROM events WHERE value IS NOT NULL GROUP BY 1, 2)"

  /** Hourly close-to-close returns per series over [[hourlyCloseBars]] —
    * the shared stage of the ts_ewm family, spelled ONCE so its
    * engine-parity details can't drift between consumers. nullif
    * divisor: an hourly close CAN be exactly 0 (ts_returns hit a zero
    * daily close at sf0.1) and Spark 4 ANSI raises DIVIDE_BY_ZERO even
    * for doubles; a zero-close predecessor yields a NULL return and the
    * row is dropped like the leading bar — [[HourlyReturnsSql]] filters
    * the identical rows.
    */
  private def hourlyReturns(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("bar_ts")
    hourlyCloseBars(s, d)
      .select(col("event_type"), col("bar_ts"),
        (col("close") / nullif(lag(col("close"), 1).over(w), lit(0.0)) - 1).as("r"))
      .filter(col("r").isNotNull)
  }

  /** DuckDB twin of [[hourlyReturns]] (expects `bars` in scope). */
  private val HourlyReturnsSql: String =
    "l AS (SELECT event_type, bar_ts, close, " +
      "lag(close, 1) OVER (PARTITION BY event_type ORDER BY bar_ts) AS prev FROM bars), " +
      "rets AS (SELECT event_type, bar_ts, close/prev - 1 AS r " +
      "FROM l WHERE prev IS NOT NULL AND prev <> 0)"

  def defs: Seq[(String, DeclaredQuery)] = Seq(

    "join_asof_exec" -> DeclaredQuery(
      // The SAME as-of semantics as join_asof, executed by the custom
      // physical operator instead of union+window — both paths are
      // oracle-checked against the identical SQL, and AsofExecSpec
      // cross-checks them row for row.
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_uid"), col("event_id").as("view_event_id"),
            col("ts").as("view_ts"))
        asofJoinNative(p, v, leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
          leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"))
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_ts " +
        "FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id"),
      "as-of join via the custom LogicalPlan/Strategy/Exec operator"),

    "join_asof_exec_fwd" -> DeclaredQuery(
      // Forward direction through the custom exec: first view at-or-after
      // each purchase. Same oracle as join_asof_fwd (the window twin);
      // the exec's forward pass peeks the sorted right head instead of
      // carrying the last-seen row — see AsofJoinExec's scaladoc.
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_uid"), col("event_id").as("view_event_id"),
            col("ts").as("view_ts"))
        asofJoinNative(p, v, leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
          leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"),
          forward = true)
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS view_event_id, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS view_ts " +
        "FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id"),
      "forward as-of via the custom exec (first at-or-after, peeked head)"),

    "join_asof_exec_nearest" -> DeclaredQuery(
      // Nearest direction through the custom exec — same oracle as the
      // window twin join_asof_nearest: the carried backward candidate and
      // the peeked forward head compete per left row, ties backward.
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_uid"), col("event_id").as("view_event_id"),
            col("ts").as("view_ts"))
        asofJoinNative(p, v, leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
          leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"),
          nearest = true)
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("WITH b AS (SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS b_eid, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS b_ts, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS f_eid, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS f_ts " +
        "FROM events p WHERE p.event_type = 'purchase') " +
        "SELECT event_id, ts, user_id, " +
        "CASE WHEN b_ts IS NULL THEN f_eid WHEN f_ts IS NULL THEN b_eid " +
        "WHEN (f_ts - ts) < (ts - b_ts) THEN f_eid ELSE b_eid END AS view_event_id, " +
        "CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts " +
        "WHEN (f_ts - ts) < (ts - b_ts) THEN f_ts ELSE b_ts END AS view_ts " +
        "FROM b ORDER BY event_id"),
      "nearest as-of via the custom exec (carried prev vs peeked next)"),

    "join_asof_exec_tol" -> DeclaredQuery(
      // Tolerance through the CUSTOM EXEC path — feature parity with the
      // union+window join_asof_tol (identical oracle): the staleness
      // check is one comparison against the exec's carried right ts.
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_uid"), col("event_id").as("view_event_id"),
            col("ts").as("view_ts"))
        asofJoinNative(p, v, leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
          leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"),
          toleranceMicros = Some(10L * 60 * 1000 * 1000))
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 10 MINUTE " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 10 MINUTE " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_ts " +
        "FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id"),
      "as-of join with staleness tolerance via the custom exec"),

    "join_asof" -> DeclaredQuery(
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_event_id"), col("ts").as("view_ts"))
        asofJoin(p, v, keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightTieBreak = Seq("view_event_id"))
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      // Not DuckDB ASOF JOIN: its tie-break among equal (user_id, ts)
      // view rows is arbitrary, while this engine deterministically takes
      // the max (ts, event_id). The correlated scalar subqueries repeat
      // that exact tie-break, so the oracle is stable on any fixture.
      Some("SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_ts " +
        "FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id"),
      "as-of join: last preceding view per purchase, per user (ties: ts<=, latest)"),

    "join_asof_tol" -> DeclaredQuery(
      // Bounded-staleness as-of: a preceding view OLDER than 10 minutes
      // is no match (pandas merge_asof tolerance). Same single-shuffle
      // union+window pass as join_asof; the tolerance is a post-filter on
      // the carried match — equivalent to windowed candidates because the
      // in-window winner IS the unbounded winner when one exists.
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_event_id"), col("ts").as("view_ts"))
        asofJoin(p, v, keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightTieBreak = Seq("view_event_id"),
          tolerance = Some(expr("INTERVAL 10 MINUTES")))
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 10 MINUTE " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_event_id, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 10 MINUTE " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_ts " +
        "FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id"),
      "as-of join with 10-minute staleness tolerance (unmatched → nulls)"),

    "join_asof_fwd" -> DeclaredQuery(
      // Forward as-of: the FIRST view at-or-after each purchase — the
      // "next quote after the trade" direction. Same union+window shape,
      // reversed ordering; identical scale properties.
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_event_id"), col("ts").as("view_ts"))
        asofJoin(p, v, keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightTieBreak = Seq("view_event_id"), forward = true)
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS view_event_id, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS view_ts " +
        "FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id"),
      "forward as-of join: first following view per purchase (ties: ts>=, earliest)"),

    "ts_ffill" -> DeclaredQuery(
      // LOCF gap-filling — corintick-domain missing-data handling. The
      // `error` rows play the nulls; last(ignoreNulls) over an unbounded
      // preceding frame is a single linear pass per key.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("v_sparse",
            when(col("event_type") === "error", lit(null)).otherwise(col("value")))
          .select(col("event_id"), col("user_id"), col("ts"),
            last(col("v_sparse"), ignoreNulls = true).over(w).as("v_filled"))
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, user_id, ts, last_value(CASE WHEN event_type = 'error' THEN NULL " +
        "ELSE value END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled " +
        "FROM events ORDER BY event_id")),

    "ts_align" -> DeclaredQuery(
      // Two-series alignment — the reference's client-side pandas merge
      // done engine-side: project each series into its own column of ONE
      // scan (no self-union, no self-join), then a single window pass
      // forward-fills both, so every output row carries the latest known
      // value of BOTH series as of that instant (the "align bid/ask"
      // quant merge). One shuffle on (key, ts) at any scale; aligning by
      // joining every A row to B rows would be the O(n²) trap.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type") === "view", col("value")).as("va"),
            when(col("event_type") === "click", col("value")).as("vb"))
          .select(col("user_id"), col("ts"), col("event_id"),
            last(col("va"), ignoreNulls = true).over(w).as("va_f"),
            last(col("vb"), ignoreNulls = true).over(w).as("vb_f"))
          .orderBy(col("event_id"))
      },
      Some("WITH u AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN event_type = 'view' THEN value END AS va, " +
        "CASE WHEN event_type = 'click' THEN value END AS vb " +
        "FROM events WHERE event_type IN ('view', 'click')) " +
        "SELECT user_id, ts, event_id, " +
        "last_value(va IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS va_f, " +
        "last_value(vb IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vb_f " +
        "FROM u ORDER BY event_id"),
      "align two series on the union of their timestamps, per-side LOCF"),

    "ts_twap" -> DeclaredQuery(
      // Hourly TWAP per series — each tick weighted by its holding time:
      // the interval to the next tick, clipped to the bar end (the last
      // tick holds until the bar closes). All weights are integer
      // MICROSECONDS (unix_micros ≙ epoch_us), so the weighted sums are
      // exact on both engines and only the final ratio rounds. One
      // window pass (lead) + one hash aggregate — the same two-shuffle
      // shape as ts_returns at any scale. Null-value ticks are excluded
      // up front so numerator and denominator see the same tick set.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val t = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("bar", date_trunc("hour", col("ts")))
          .withColumn("next_ts", lead(col("ts"), 1).over(w))
        val barEndUs = unix_micros(col("bar") + expr("INTERVAL 1 HOUR"))
        val wUs = least(coalesce(unix_micros(col("next_ts")), barEndUs), barEndUs) -
          unix_micros(col("ts"))
        t.withColumn("__w", wUs)
          .groupBy("user_id", "bar")
          .agg(round(sum(col("value") * col("__w")) / nullif(sum(col("__w")), lit(0L)), 6)
            .as("twap"), count(lit(1)).as("n_ticks"))
          .orderBy(col("user_id"), col("bar"))
      },
      Some("WITH t AS (SELECT user_id, ts, event_id, value, " +
        "date_trunc('hour', ts) AS bar, " +
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts " +
        "FROM events WHERE value IS NOT NULL), " +
        "x AS (SELECT user_id, bar, value, " +
        "least(coalesce(epoch_us(next_ts), epoch_us(bar + INTERVAL 1 HOUR)), " +
        "epoch_us(bar + INTERVAL 1 HOUR)) - epoch_us(ts) AS w FROM t) " +
        "SELECT user_id, bar, round(sum(value * w) / nullif(sum(w), 0), 6) AS twap, " +
        "count(*) AS n_ticks FROM x GROUP BY user_id, bar ORDER BY user_id, bar"),
      "hourly TWAP per series: holding-time-weighted mean, exact µs weights"),

    "ts_gapfill" -> DeclaredQuery(
      // Regularize an irregular series onto a fixed hourly grid, then
      // LOCF-fill the holes — the corintick-domain "resample to bars,
      // carry last print forward" workflow in one query. The grid is
      // generated per key from that key's own extent (sequence+explode:
      // rows ∝ span, never a global cross product), the hourly means are
      // one hash aggregate, and the fill is a single window pass — three
      // shuffle-bounded steps at any scale. user_id < 20 bounds the
      // declared output; the operator itself has no such limit.
      (s, d) => {
        val hourly = Tables.events(s, d)
          .filter(col("user_id") < 20)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
          .agg(round(avg(col("value")), 6).as("v"), count(lit(1)).as("n"))
        val grid = hourly.groupBy("user_id")
          .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr"))
        val w = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "hr"), "left")
          .select(col("user_id"), col("hr"),
            last(col("v"), ignoreNulls = true).over(w).as("v_fill"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("user_id"), col("hr"))
      },
      Some("WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hr, " +
        "round(avg(value), 6) AS v, count(*) AS n FROM events WHERE user_id < 20 GROUP BY 1, 2), " +
        "grid AS (SELECT user_id, unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr " +
        "FROM hourly GROUP BY user_id) " +
        "SELECT g.user_id, g.hr, last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.user_id " +
        "ORDER BY g.hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill, " +
        "coalesce(h.n, 0) AS n FROM grid g LEFT JOIN hourly h " +
        "ON g.user_id = h.user_id AND g.hr = h.hr ORDER BY g.user_id, g.hr"),
      "hourly grid regularization + LOCF fill per series (gap-filling)"),

    "ts_returns" -> DeclaredQuery(
      // Resample per-uid to daily close, then pct-change — two shuffles
      // (hash agg on (user, day); window on user) over #groups rows only.
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
        val w = Window.partitionBy("user_id").orderBy("day")
        // nullif divisor: a day's close CAN be exactly 0 at larger scale
        // factors (one at sf0.1), and Spark 4 ANSI raises DIVIDE_BY_ZERO
        // even for doubles — null return matches the oracle's nullif
        daily.select(col("user_id"), col("day"), col("close"),
          round((col("close") - lag(col("close"), 1).over(w)) /
              nullif(lag(col("close"), 1).over(w), lit(0.0)), 6)
            .as("ret"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, " +
        "last(value ORDER BY ts, event_id) AS close FROM events GROUP BY 1, 2) " +
        // + 0.0 kills DuckDB's -0.0 (Spark's BigDecimal round never emits
        // a signed zero); nullif mirrors the Spark side
        "SELECT user_id, day, close, round((close - lag(close) OVER (PARTITION BY user_id " +
        "ORDER BY day)) / nullif(lag(close) OVER (PARTITION BY user_id ORDER BY day), 0), 6) + 0.0 AS ret " +
        "FROM daily ORDER BY user_id, day")),

    "ts_resample_5m" -> DeclaredQuery(
      // Sub-hour resampling: 5-minute bars per event_type via shared
      // epoch-floor arithmetic (unix_timestamp truncates to seconds on
      // both engines; DuckDB's `//` is integer division — its `/` is
      // float). One hash aggregate; bar count is bounded by span/5min ×
      // #types regardless of input volume.
      (s, d) => Tables.events(s, d)
        .groupBy((expr("unix_timestamp(ts) div 300") * 300)
          .cast("timestamp").as("bar_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v_sum"),
          round(avg(col("value")), 6).as("v_avg"))
        .orderBy(col("bar_ts"), col("event_type")),
      // floor() before the BIGINT cast: DuckDB CAST(double→int) ROUNDS,
      // which would bump a x.5+ sub-second fraction into the next bucket
      // make_timestamp (naive µs), NOT to_timestamp (returns TIMESTAMPTZ)
      Some("SELECT make_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 * 1000000) AS bar_ts, " +
        "event_type, count(*) AS n, round(sum(value), 4) AS v_sum, " +
        "round(avg(value), 6) AS v_avg FROM events " +
        "GROUP BY 1, 2 ORDER BY bar_ts, event_type"),
      "5-minute bar resampling (epoch-floor bucketing)"),

    "ts_atr" -> DeclaredQuery(
      // Average True Range over 1-hour bars per instrument class — the
      // volatility companion to ts_bollinger/ts_rsi: TR = greatest(
      // high−low, |high−prev_close|, |low−prev_close|) (first bar falls
      // back to high−low), ATR = 14-bar rolling mean. One hash aggregate
      // to bars (bar count is span-bounded, not row-bounded), then two
      // window passes over the tiny bar table sharing one (type) sort.
      // O(1)-magnitude arithmetic + 6dp rounding absorb the engines'
      // different frame-summation orders (the win_movavg precedent).
      (s, d) => {
        val bars = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("bar_ts"), col("event_type"))
          .agg(graft.Q.ohlcAggs(col("ts"), col("event_id"), col("value")).head,
            graft.Q.ohlcAggs(col("ts"), col("event_id"), col("value")).tail: _*)
        val wLag = Window.partitionBy("event_type").orderBy("bar_ts")
        val wAtr = wLag.rowsBetween(-13, Window.currentRow)
        bars
          .withColumn("prev_c", lag(col("close"), 1).over(wLag))
          .withColumn("tr", when(col("prev_c").isNull, col("high") - col("low"))
            .otherwise(greatest(col("high") - col("low"),
              abs(col("high") - col("prev_c")), abs(col("low") - col("prev_c")))))
          .select(col("bar_ts"), col("event_type"), round(col("tr"), 6).as("tr"),
            round(avg(col("tr")).over(wAtr), 6).as("atr"))
          .orderBy(col("bar_ts"), col("event_type"))
      },
      Some("WITH bars AS (SELECT date_trunc('hour', ts) AS bar_ts, event_type, " +
        "max(value) AS high, min(value) AS low, " +
        "last(value ORDER BY ts, event_id) AS close FROM events GROUP BY 1, 2), " +
        "t AS (SELECT bar_ts, event_type, high, low, " +
        "lag(close, 1) OVER (PARTITION BY event_type ORDER BY bar_ts) AS prev_c FROM bars), " +
        "tr AS (SELECT bar_ts, event_type, CASE WHEN prev_c IS NULL THEN high - low " +
        "ELSE greatest(high - low, abs(high - prev_c), abs(low - prev_c)) END AS tr FROM t) " +
        "SELECT bar_ts, event_type, round(tr, 6) AS tr, " +
        "round(avg(tr) OVER (PARTITION BY event_type ORDER BY bar_ts " +
        "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 6) AS atr " +
        "FROM tr ORDER BY bar_ts, event_type"),
      "average true range: OHLC bars, true-range lag arithmetic, 14-bar rolling mean"),

    "ts_cusum" -> DeclaredQuery(
      // One-sided CUSUM drift detection per instrument — the Page
      // changepoint statistic over purchase values via the native Cusum
      // AggregateWindowFunction (expressions/CusumWin.scala): max(0,
      // s + (x − drift)) has NO prefix-sum closed form (unlike EWMA's
      // geometric weights), so the running-frame window recurrence is
      // the only O(n) spelling. Alarm = statistic over threshold. Both
      // engines execute literally greatest(0, s + (x − 55)) in binary64,
      // so 6dp-rounded outputs hash-match; the oracle is one recursive
      // CTE over per-user row numbers (the win_ewma recipe).
      (s, d) => {
        val c = graft.functions.expressions.CusumWin.cusumOver(col("value"), 55.0,
          partitionBy = Seq(col("user_id")), orderBy = Seq(col("ts"), col("event_id")))
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), round(c, 6).as("cusum"),
            (c > 200.0).as("alarm"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("WITH RECURSIVE base AS (SELECT user_id, event_id, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
        "FROM events WHERE event_type = 'purchase'), " +
        "r AS (SELECT user_id, event_id, rn, " +
        "greatest(0.0, 0.0 + (value - 55.0)) AS s FROM base WHERE rn = 1 " +
        "UNION ALL SELECT b.user_id, b.event_id, b.rn, " +
        "greatest(0.0, r.s + (b.value - 55.0)) " +
        "FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1) " +
        "SELECT user_id, event_id, round(s, 6) AS cusum, s > 200.0 AS alarm " +
        "FROM r ORDER BY user_id, event_id"),
      "per-instrument CUSUM changepoint statistic (native running window recurrence, no closed form)"),

    "ts_volume_bars" -> DeclaredQuery(
      // Volume-bar construction — the event-driven bar family (volume/
      // dollar bars) finance pipelines use instead of clock bars: a new
      // bar opens every V units of traded value. Inherently sequential
      // PER INSTRUMENT, so the window partitions by the instrument
      // (user_id here plays the symbol) — thousands of independent
      // partitions at scale, one window pass + one hash aggregate, no
      // global sort. The cumulative volume runs in EXACT e4-scaled longs
      // (a double cumsum would drift with partition merge order); bar id
      // = pre-trade cumulative volume div V, so a trade that crosses the
      // boundary opens the new bar on both engines identically.
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            round(col("value") * 10000).cast("long").as("v_e4"))
          .withColumn("cum", sum(col("v_e4")).over(w))
          .withColumn("bar", expr("(cum - v_e4) div 5000000L"))
          .groupBy("user_id", "bar")
          .agg(count(lit(1)).as("n"), sum(col("v_e4")).as("vol_e4"),
            min(col("ts")).as("ts_open"), max(col("ts")).as("ts_close"))
          .orderBy(col("user_id"), col("bar"))
      },
      Some("WITH t AS (SELECT user_id, ts, event_id, " +
        "CAST(round(value * 10000) AS BIGINT) AS v_e4 FROM events " +
        "WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts, v_e4, CAST(sum(v_e4) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS cum FROM t) " +
        "SELECT user_id, (cum - v_e4) // 5000000 AS bar, count(*) AS n, " +
        "CAST(sum(v_e4) AS BIGINT) AS vol_e4, min(ts) AS ts_open, max(ts) AS ts_close " +
        "FROM c GROUP BY user_id, (cum - v_e4) // 5000000 " +
        "ORDER BY user_id, bar"),
      "event-driven volume bars: exact integer cumulative volume, per-instrument windows"),

    "ts_sessionize" -> DeclaredQuery(
      // Batch sessionization — the classic clickstream/telemetry shape: a
      // session breaks when a series goes quiet for > 12h. Session ids
      // come from the lag-gap-cumsum idiom (new-session flag where the
      // gap from the previous tick exceeds the threshold, running sum of
      // flags = session ordinal), so the whole operator is ONE window
      // pass + ONE hash aggregate that reuses the window's (user_id)
      // partitioning — two shuffles at any scale, state O(1) per row.
      // Gap arithmetic is integer MICROSECONDS: exact on both engines.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = 12L * 3600L * 1000000L
        val t = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("__new",
            when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs
              || lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        t.groupBy("user_id", "session_id")
          .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("v_sum"))
          .orderBy(col("user_id"), col("session_id"))
      },
      // sum() OVER returns HUGEINT in DuckDB — CAST to BIGINT to match
      Some("WITH m AS (SELECT user_id, ts, event_id, value, " +
        "CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 43200000000 " +
        "OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS nw FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "x AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS session_id FROM m) " +
        "SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events, round(sum(value), 4) AS v_sum " +
        "FROM x GROUP BY user_id, session_id ORDER BY user_id, session_id"),
      "gap-based sessionization (12h idle gap): lag-cumsum session ids + per-session stats"),

    "ts_m4" -> DeclaredQuery(
      // M4 downsampling (Jugel et al., VLDB 2014): per series per pixel
      // bucket keep exactly min / max / first / last — the four points
      // that make a line rendering of the bucket pixel-identical to the
      // full series. THE way to plot a 100 TB series: output is
      // #series × #buckets regardless of input rows. first/last are
      // spelled as conditional aggregates over asc/desc row_numbers (the
      // engine-portable spelling of arg_min/arg_max with a composite
      // (ts, event_id) tie-break); both windows and the aggregate share
      // the (event_type, day) hash partitioning — one shuffle total.
      (s, d) => {
        val t = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .withColumn("bucket", date_trunc("day", col("ts")))
        val wAsc = Window.partitionBy("event_type", "bucket")
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy("event_type", "bucket")
          .orderBy(col("ts").desc, col("event_id").desc)
        t.withColumn("__ra", row_number().over(wAsc))
          .withColumn("__rd", row_number().over(wDesc))
          .groupBy("event_type", "bucket")
          .agg(round(min(col("value")), 6).as("v_min"),
            round(max(col("value")), 6).as("v_max"),
            round(max(when(col("__ra") === 1, col("value"))), 6).as("v_first"),
            round(max(when(col("__rd") === 1, col("value"))), 6).as("v_last"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("bucket"))
      },
      Some("WITH t AS (SELECT event_type, date_trunc('day', ts) AS bucket, value, " +
        "row_number() OVER (PARTITION BY event_type, date_trunc('day', ts) " +
        "ORDER BY ts, event_id) AS ra, " +
        "row_number() OVER (PARTITION BY event_type, date_trunc('day', ts) " +
        "ORDER BY ts DESC, event_id DESC) AS rd " +
        "FROM events WHERE value IS NOT NULL) " +
        "SELECT event_type, bucket, round(min(value), 6) AS v_min, " +
        "round(max(value), 6) AS v_max, " +
        "round(max(CASE WHEN ra = 1 THEN value END), 6) AS v_first, " +
        "round(max(CASE WHEN rd = 1 THEN value END), 6) AS v_last, count(*) AS n " +
        "FROM t GROUP BY event_type, bucket ORDER BY event_type, bucket"),
      "M4 time-series downsampling: min/max/first/last per series per bucket"),

    "ts_outliers" -> DeclaredQuery(
      // Rolling z-score anomaly flags: each tick scored against the
      // trailing 20-tick mean/stddev of ITS OWN series — one window pass,
      // no self-join, no global statistics bottleneck. Warmup guard
      // (≥ 10 trailing ticks) keeps early unstable stddevs out. The flag
      // compares the ROUNDED score so both engines make identical
      // boundary decisions (same idiom as llm_jaccard_pairs).
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-20, -1)
        val t = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("__n", count(col("value")).over(w))
          .withColumn("__mu", avg(col("value")).over(w))
          .withColumn("__sd", stddev_samp(col("value")).over(w))
        t.filter(col("__n") >= 10)
          .select(col("event_id"), col("user_id"), col("value"),
            round((col("value") - col("__mu")) / nullif(col("__sd"), lit(0.0)), 6).as("z"))
          .withColumn("is_outlier", abs(col("z")) > 2.0)
          .orderBy(col("event_id"))
      },
      Some("WITH t AS (SELECT event_id, user_id, value, " +
        "count(value) OVER w AS n, avg(value) OVER w AS mu, " +
        "stddev_samp(value) OVER w AS sd FROM events WHERE value IS NOT NULL " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) " +
        "SELECT event_id, user_id, value, " +
        "round((value - mu) / nullif(sd, 0), 6) + 0.0 AS z, " +
        "abs(round((value - mu) / nullif(sd, 0), 6)) > 2.0 AS is_outlier " +
        "FROM t WHERE n >= 10 ORDER BY event_id"),
      "rolling z-score outlier flags per series (trailing window, warmup-guarded)"),

    "join_asof_nearest" -> DeclaredQuery(
      // Nearest as-of (pandas merge_asof direction='nearest'): closest
      // view in EITHER direction per purchase, equal-distance ties going
      // backward. One shuffle carries both direction candidates — see
      // asofJoinNearest's scaladoc for the two-frame single-exchange
      // shape. The oracle repeats the engine's exact tie-breaks in both
      // correlated subqueries and picks the nearer via interval compare.
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_event_id"), col("ts").as("view_ts"))
        asofJoinNearest(p, v, keys = Seq("user_id"), leftTs = "ts", rightTs = "view_ts",
          rightTieBreak = Seq("view_event_id"))
          .select("event_id", "ts", "user_id", "view_event_id", "view_ts")
          .orderBy(col("event_id"))
      },
      Some("WITH b AS (SELECT p.event_id, p.ts, p.user_id, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS b_eid, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts <= p.ts " +
        "ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS b_ts, " +
        "(SELECT v.event_id FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS f_eid, " +
        "(SELECT v.ts FROM events v WHERE v.event_type = 'view' " +
        "AND v.user_id = p.user_id AND v.ts >= p.ts " +
        "ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS f_ts " +
        "FROM events p WHERE p.event_type = 'purchase') " +
        "SELECT event_id, ts, user_id, " +
        "CASE WHEN b_ts IS NULL THEN f_eid WHEN f_ts IS NULL THEN b_eid " +
        "WHEN (f_ts - ts) < (ts - b_ts) THEN f_eid ELSE b_eid END AS view_event_id, " +
        "CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts " +
        "WHEN (f_ts - ts) < (ts - b_ts) THEN f_ts ELSE b_ts END AS view_ts " +
        "FROM b ORDER BY event_id"),
      "nearest-direction as-of join (closest view either way; ties backward)"),

    "ts_corr" -> DeclaredQuery(
      // Cross-series correlation matrix: Pearson r between every pair of
      // event-type series after aligning them on a daily grid. The align
      // step is a hash aggregate down to #types × #days rows — the raw
      // ticks never pairwise-join, so input volume only affects the ONE
      // aggregate pass; the pair join runs over the tiny aligned table
      // (broadcastable at any corpus size: days × types). Upper triangle
      // only (type_a < type_b); r rounded to 6dp — double-sum ordering
      // differences between engines sit ~1e-13, far below the rounding.
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(avg(col("value")).as("v"))
        val a = daily.select(col("event_type").as("type_a"), col("day"), col("v").as("va"))
        val b = daily.select(col("event_type").as("type_b"), col("day").as("day_b"), col("v").as("vb"))
        a.join(broadcast(b), col("day") === col("day_b") && col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b")
          .agg(round(corr(col("va"), col("vb")), 6).as("r"), count(lit(1)).as("n_days"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day, " +
        "avg(value) AS v FROM events WHERE value IS NOT NULL GROUP BY 1, 2) " +
        "SELECT a.event_type AS type_a, b.event_type AS type_b, " +
        "round(corr(a.v, b.v), 6) AS r, count(*) AS n_days " +
        "FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
      "pairwise Pearson correlation between series on an aligned daily grid"),

    "ts_interp_linear" -> DeclaredQuery(
      // Linear interpolation onto a regular hourly grid — ts_gapfill's
      // sibling where a gap is filled by the straight line between its
      // bracketing observations instead of carrying the last one
      // forward. Same three shuffle-bounded steps (hourly aggregate,
      // per-key grid from the key's own extent, one window pass); the
      // window pass carries BOTH brackets (last observed value/hour
      // behind, first ahead) in two frames over one (user_id) shuffle.
      // Every grid point lies inside [first obs, last obs] by
      // construction, so both brackets always exist and the weight
      // denominator is strictly positive on unobserved points (observed
      // points short-circuit to their own value before any division).
      (s, d) => {
        val hourly = Tables.events(s, d)
          .filter(col("user_id") < 20)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
          .agg(round(avg(col("value")), 6).as("v"))
        val grid = hourly.groupBy("user_id")
          .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr"))
        val wB = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val j = grid.join(hourly, Seq("user_id", "hr"), "left")
          .withColumn("__pv", last(col("v"), ignoreNulls = true).over(wB))
          .withColumn("__ph", last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wB))
          .withColumn("__nv", first(col("v"), ignoreNulls = true).over(wF))
          .withColumn("__nh", first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wF))
        j.select(col("user_id"), col("hr"),
            // NO final round: the operands are already deterministic (6dp
            // v's, exact integer micros), and -, *, /, + are correctly
            // rounded IEEE ops — identical bits on both engines. A 6dp
            // round here CREATES divergence at half-way points (x.xxxxxx5
            // ties resolve differently across engines).
            when(col("v").isNotNull, col("v")).otherwise(
              col("__pv") + (col("__nv") - col("__pv")) *
                (unix_micros(col("hr")) - unix_micros(col("__ph"))).cast("double") /
                (unix_micros(col("__nh")) - unix_micros(col("__ph"))).cast("double"))
              .as("v_interp"),
            col("v").isNotNull.as("is_observed"))
          .orderBy(col("user_id"), col("hr"))
      },
      Some("WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hr, " +
        "round(avg(value), 6) AS v FROM events WHERE user_id < 20 GROUP BY 1, 2), " +
        "grid AS (SELECT user_id, unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr " +
        "FROM hourly GROUP BY user_id), " +
        "j AS (SELECT g.user_id, g.hr, h.v, " +
        "last_value(h.v IGNORE NULLS) OVER wb AS pv, " +
        "last_value(CASE WHEN h.v IS NOT NULL THEN g.hr END IGNORE NULLS) OVER wb AS ph, " +
        "first_value(h.v IGNORE NULLS) OVER wf AS nv, " +
        "first_value(CASE WHEN h.v IS NOT NULL THEN g.hr END IGNORE NULLS) OVER wf AS nh " +
        "FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr " +
        "WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.hr " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wf AS (PARTITION BY g.user_id ORDER BY g.hr " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, hr, CASE WHEN v IS NOT NULL THEN v ELSE " +
        "pv + (nv - pv) * CAST(epoch_us(hr) - epoch_us(ph) AS DOUBLE) / " +
        "CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE) END AS v_interp, " +
        "v IS NOT NULL AS is_observed FROM j ORDER BY user_id, hr"),
      "linear interpolation onto an hourly grid (bracketing-observation line)"),

    "ts_funnel" -> DeclaredQuery(
      // Ordered-sequence funnel (view → click → purchase, each stage AT
      // OR AFTER the previous — ts >= on both engines, so an equal-ts
      // pair satisfies the order): the classic product-analytics
      // operator. Three conditional-min window passes over ONE (user_id)
      // shuffle resolve each user's stage timestamps (stage k's min ts
      // references stage k-1's — windows chain, partitioning is reused),
      // then the per-user flag collapse REUSES that same partitioning
      // (groupBy user after a user-partitioned window adds no exchange)
      // and only the per-user flags shuffle to the decile aggregate.
      // Deliberately NOT count(DISTINCT …): multiple distinct aggregates
      // plan an Expand that replays the full event volume 4× through the
      // shuffle; flag-collapse-then-sum is exchange-free until the rows
      // are already one-per-user. No joins, no per-user subqueries.
      (s, d) => {
        val w = Window.partitionBy("user_id")
        val t = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_type"))
          .withColumn("__v0", min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("__c0", min(when(col("event_type") === "click" &&
            col("ts") >= col("__v0"), col("ts"))).over(w))
          .withColumn("__p0", min(when(col("event_type") === "purchase" &&
            col("ts") >= col("__c0"), col("ts"))).over(w))
        val perUser = t.groupBy("user_id")
          .agg(max(col("__v0").isNotNull.cast("long")).as("f_view"),
            max(col("__c0").isNotNull.cast("long")).as("f_click"),
            max(col("__p0").isNotNull.cast("long")).as("f_full"))
        perUser.groupBy((col("user_id") % 10).as("user_decile"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("f_view")).as("n_view"),
            sum(col("f_click")).as("n_view_click"),
            sum(col("f_full")).as("n_funnel_full"))
          .orderBy(col("user_decile"))
      },
      Some("WITH a AS (SELECT user_id, ts, event_type, " +
        "min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS v0 " +
        "FROM events), " +
        "b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= v0 THEN ts END) " +
        "OVER (PARTITION BY user_id) AS c0 FROM a), " +
        "c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= c0 THEN ts END) " +
        "OVER (PARTITION BY user_id) AS p0 FROM b) " +
        "SELECT user_id % 10 AS user_decile, count(DISTINCT user_id) AS n_users, " +
        "count(DISTINCT CASE WHEN v0 IS NOT NULL THEN user_id END) AS n_view, " +
        "count(DISTINCT CASE WHEN c0 IS NOT NULL THEN user_id END) AS n_view_click, " +
        "count(DISTINCT CASE WHEN p0 IS NOT NULL THEN user_id END) AS n_funnel_full " +
        "FROM c GROUP BY 1 ORDER BY user_decile"),
      "view→click→purchase funnel: chained conditional-min windows, one user shuffle"),

    "ts_retention" -> DeclaredQuery(
      // Cohort retention — users grouped by first-activity day, counted
      // again at day +1 and +7: the other half of the product-analytics
      // pair. Distinct (user, day) activity first (collapses tick volume
      // to at most users × days); the cohort day is a WINDOW MIN over
      // the same user partitioning, not a self-join — one fork, no
      // duplicated upstream. The explicit repartition(user_id) is
      // load-bearing: hash(user) is a subset of the distinct's
      // clustering key and exactly the window's, so ONE exchange feeds
      // both (the planner's default would hash(user, day) for the
      // distinct and re-exchange for the window; PlanSpec pins the
      // 2-exchange budget). count(*) not count(DISTINCT): (user, day)
      // rows are already distinct, so a user contributes at most one row
      // per (cohort, offset) — same value, no distinct-aggregate Expand.
      // datediff on day-truncated timestamps is exact integer math.
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .repartition(col("user_id"))
          .distinct()
        act.withColumn("cohort_day", min(col("day")).over(Window.partitionBy("user_id")))
          .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("long"))
          .filter(col("offset").isin(0L, 1L, 7L))
          .groupBy("cohort_day", "offset")
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_day"), col("offset"))
      },
      Some("WITH act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events), " +
        "x AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM act) " +
        "SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS BIGINT) AS \"offset\", " +
        "count(*) AS n_users FROM x " +
        "WHERE date_diff('day', cohort_day, day) IN (0, 1, 7) " +
        "GROUP BY 1, 2 ORDER BY cohort_day, \"offset\""),
      "cohort retention (day 0/+1/+7 active users per first-activity cohort)"),

    "ts_diurnal" -> DeclaredQuery(
      // Diurnal (hour-of-day) seasonality profile per series — the
      // classic "when is this metric active" rollup: one hash aggregate
      // to a fixed #types × 24 table regardless of input volume.
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("v_avg"))
        .orderBy(col("event_type"), col("hod")),
      Some("SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, count(*) AS n, " +
        "round(avg(value), 6) AS v_avg FROM events " +
        "GROUP BY 1, 2 ORDER BY event_type, hod"),
      "hour-of-day seasonality profile per series (fixed-size rollup)"),

    "ts_bollinger" -> DeclaredQuery(
      // Bollinger bands on RESAMPLED bars: hourly close per series, then
      // a trailing 20-bar mean ± 2σ window over the bars. The compose
      // order is the scale story — the bar stage is a max_by hash
      // aggregate (map-side combinable: raw ticks collapse to one bar
      // per (series, hour) per input partition BEFORE the exchange), so
      // only bars ever shuffle; the window pass then runs over
      // #series × #hours rows. Warmup ≥ 10 bars; band flags compare
      // ROUNDED bounds so both engines make identical boundary calls
      // (ts_outliers idiom).
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("bar_ts"))
          .rowsBetween(-19, 0)
        hourlyCloseBars(s, d)
          .withColumn("__n", count(col("close")).over(w))
          .withColumn("__mu", avg(col("close")).over(w))
          .withColumn("__sd", stddev_samp(col("close")).over(w))
          .filter(col("__n") >= 10)
          .select(col("event_type"), col("bar_ts"),
            round(col("close"), 6).as("close"),
            round(col("__mu"), 6).as("ma"),
            round(col("__mu") + lit(2.0) * col("__sd"), 6).as("upper"),
            round(col("__mu") - lit(2.0) * col("__sd"), 6).as("lower"))
          .withColumn("breach",
            when(col("close") > col("upper"), lit("up"))
              .when(col("close") < col("lower"), lit("down"))
              .otherwise(lit("in")))
          .orderBy(col("event_type"), col("bar_ts"))
      },
      Some(s"WITH $HourlyCloseBarsSql, " +
        "b AS (SELECT event_type, bar_ts, close, count(close) OVER w AS n, " +
        "avg(close) OVER w AS mu, stddev_samp(close) OVER w AS sd FROM bars " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY bar_ts " +
        "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) " +
        "SELECT event_type, bar_ts, round(close, 6) AS close, round(mu, 6) AS ma, " +
        "round(mu + 2.0 * sd, 6) AS upper, round(mu - 2.0 * sd, 6) AS lower, " +
        "CASE WHEN round(close, 6) > round(mu + 2.0 * sd, 6) THEN 'up' " +
        "WHEN round(close, 6) < round(mu - 2.0 * sd, 6) THEN 'down' ELSE 'in' END AS breach " +
        "FROM b WHERE n >= 10 ORDER BY event_type, bar_ts"),
      "Bollinger bands over hourly resampled bars (trailing 20-bar mean ± 2σ)"),

    "ts_rsi" -> DeclaredQuery(
      // Cutler's RSI (simple-average variant — the SMA spelling is
      // ANSI-window-expressible, unlike Wilder's recursive EWM): hourly
      // close bars per series, lag-diff into gains/losses, trailing
      // 14-bar averages, RSI = 100 − 100/(1+RS). Same bars-first shape
      // as ts_bollinger: every pass after the bar aggregate runs on
      // #series × #hours rows and reuses the bar partitioning. The
      // ag/(ag+al) form yields RSI 0 for all-loss and 100 for all-gain
      // windows by itself; the nullif guard fires only on a FULLY FLAT
      // window (ag=al=0), which emits a NULL rsi on both engines.
      (s, d) => {
        val ord = Window.partitionBy("event_type").orderBy(col("bar_ts"))
        val trail = ord.rowsBetween(-13, 0)
        hourlyCloseBars(s, d)
          .withColumn("__d", col("close") - lag(col("close"), 1).over(ord))
          .withColumn("__g", when(col("__d") > 0, col("__d")).otherwise(lit(0.0)))
          .withColumn("__l", when(col("__d") < 0, -col("__d")).otherwise(lit(0.0)))
          .withColumn("__n", count(col("__d")).over(trail))
          .withColumn("__ag", avg(col("__g")).over(trail))
          .withColumn("__al", avg(col("__l")).over(trail))
          .filter(col("__n") >= 14)
          .select(col("event_type"), col("bar_ts"),
            round(lit(100.0) * col("__ag") / nullif(col("__ag") + col("__al"), lit(0.0)), 6)
              .as("rsi"))
          .orderBy(col("event_type"), col("bar_ts"))
      },
      Some(s"WITH $HourlyCloseBarsSql, " +
        "d AS (SELECT event_type, bar_ts, " +
        "close - lag(close) OVER (PARTITION BY event_type ORDER BY bar_ts) AS dd FROM bars), " +
        "g AS (SELECT event_type, bar_ts, " +
        "count(dd) OVER w AS n, " +
        "avg(CASE WHEN dd > 0 THEN dd ELSE 0.0 END) OVER w AS ag, " +
        "avg(CASE WHEN dd < 0 THEN -dd ELSE 0.0 END) OVER w AS al FROM d " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY bar_ts " +
        "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT event_type, bar_ts, " +
        "round(100.0 * ag / nullif(ag + al, 0.0), 6) AS rsi " +
        "FROM g WHERE n >= 14 ORDER BY event_type, bar_ts"),
      "Cutler's RSI over hourly bars (trailing 14-bar simple averages)"),

    "ts_drawdown" -> DeclaredQuery(
      // Running-peak drawdown per user series: cumulative max over the
      // tick stream, per-tick gap to peak, then a per-series rollup (max
      // drawdown magnitude, peak, final value). One (user_id) shuffle
      // feeds both the window and the aggregate — the rollup keeps
      // output at #series rows regardless of tick volume. Absolute
      // drawdown (value − peak), not a ratio: `value` spans negative
      // territory in the fixture, where a ratio flips sign at peak≤0.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("__peak", max(col("value")).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            round(max(col("value")), 6).as("peak"),
            round(min(col("value") - col("__peak")), 6).as("max_dd"))
          .orderBy(col("user_id"))
      },
      Some("WITH t AS (SELECT user_id, value, " +
        "max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak " +
        "FROM events WHERE value IS NOT NULL) " +
        "SELECT user_id, count(*) AS n, round(max(value), 6) AS peak, " +
        "round(min(value - peak), 6) AS max_dd " +
        "FROM t GROUP BY user_id ORDER BY user_id"),
      "running-peak drawdown per series (one shuffle: window + rollup)"),

    "ts_beta" -> DeclaredQuery(
      // Per-series market beta (and alpha): each event-type's daily
      // series regressed against the equal-weight market (the
      // cross-type daily mean). ts_corr's scale shape: ONE aggregate
      // collapses raw ticks to #types × #days, the market series is an
      // aggregate OVER that tiny table, and the join back is a
      // #days-row broadcast — tick volume only ever touches the first
      // pass. covar_samp/var_samp spell identically in both engines;
      // 6dp rounding absorbs double-sum ordering (~1e-13), as ts_corr.
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(avg(col("value")).as("v"))
        val market = daily.groupBy("day").agg(avg(col("v")).as("m"))
        daily.join(broadcast(market), "day")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            round(covar_samp(col("v"), col("m")) / var_samp(col("m")), 6).as("beta"),
            round(avg(col("v")) - covar_samp(col("v"), col("m")) / var_samp(col("m")) * avg(col("m")), 6)
              .as("alpha"))
          .orderBy(col("event_type"))
      },
      Some("WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day, avg(value) AS v " +
        "FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
        "mkt AS (SELECT day, avg(v) AS m FROM daily GROUP BY day) " +
        "SELECT event_type, count(*) AS n_days, " +
        "round(covar_samp(v, m) / var_samp(m), 6) AS beta, " +
        "round(avg(v) - covar_samp(v, m) / var_samp(m) * avg(m), 6) AS alpha " +
        "FROM daily JOIN mkt USING (day) GROUP BY event_type ORDER BY event_type"),
      "per-series beta/alpha vs the equal-weight market (daily-aligned)"),

    "ts_seasonal" -> DeclaredQuery(
      // Additive seasonal decomposition residuals: value minus its
      // series' hour-of-day mean and day-of-week mean, plus the grand
      // mean (classic two-factor deseasonalization; what remains is
      // trend + noise). ALL THREE mean tables derive from ONE shared
      // (type, hod, dow) pre-aggregate — #types × 24 × 7 rows — by
      // re-aggregating its (sum, count) pairs, so the three mean
      // subtrees are IDENTICAL below their final agg and ReuseExchange
      // collapses them to a single scan+aggregate (PlanSpec pins 2
      // event scans total: cube + residual probe; the naive
      // independent-avg spelling costs 4). Means spelled sum/count on
      // both sides so the two-level summation structure matches; 6dp
      // rounding absorbs partial-order noise as usual.
      (s, d) => {
        // coalesce makes the bucket keys NON-NULLABLE: otherwise each
        // inner join infers a different IsNotNull(hour/dayofweek) filter
        // into its cube branch, the subtrees stop being canonically
        // identical, and ReuseExchange cannot collapse them (ts is never
        // null, so the -1 bucket is unreachable)
        val e = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"), col("value"),
            coalesce(hour(col("ts")), lit(-1)).as("__hod"),
            coalesce(dayofweek(col("ts")), lit(-1)).as("__dow"))
        val cube = e.groupBy("event_type", "__hod", "__dow")
          .agg(sum("value").as("__s"), count(lit(1)).as("__n"))
        def meansBy(keys: String*) = cube.groupBy(keys.map(col): _*)
          .agg((sum(col("__s")) / sum(col("__n"))).as(s"__m${keys.length}"))
        val hod = meansBy("event_type", "__hod").withColumnRenamed("__m2", "__mh")
        val dow = meansBy("event_type", "__dow").withColumnRenamed("__m2", "__md")
        val grand = meansBy("event_type").withColumnRenamed("__m1", "__mg")
        e.join(broadcast(hod), Seq("event_type", "__hod"))
          .join(broadcast(dow), Seq("event_type", "__dow"))
          .join(broadcast(grand), Seq("event_type"))
          .select(col("event_id"), col("event_type"),
            round(col("value") - col("__mh") - col("__md") + col("__mg"), 6).as("resid"))
          .orderBy(col("event_id"))
      },
      Some("WITH e AS (SELECT event_id, event_type, value, coalesce(hour(ts), -1) AS hod, " +
        "coalesce(isodow(ts) % 7 + 1, -1) AS dow FROM events WHERE value IS NOT NULL), " +
        "cube AS (SELECT event_type, hod, dow, sum(value) AS s, count(*) AS n " +
        "FROM e GROUP BY 1, 2, 3), " +
        "h AS (SELECT event_type, hod, sum(s) / sum(n) AS mh FROM cube GROUP BY 1, 2), " +
        "d AS (SELECT event_type, dow, sum(s) / sum(n) AS md FROM cube GROUP BY 1, 2), " +
        "g AS (SELECT event_type, sum(s) / sum(n) AS mg FROM cube GROUP BY 1) " +
        "SELECT e.event_id, e.event_type, round(value - mh - md + mg, 6) AS resid " +
        "FROM e JOIN h USING (event_type, hod) JOIN d USING (event_type, dow) " +
        "JOIN g USING (event_type) ORDER BY event_id"),
      "two-factor seasonal residuals (one shared pre-aggregate feeds all means)"),

    "ts_feature_windows" -> DeclaredQuery(
      // Multi-horizon feature generation — the classic ML feature shape
      // ("views in the last 1h / 24h, spend in the last 7d, as of each
      // purchase"): three RANGE frames over ONE (user_id, µs) sort, all
      // strictly-preceding (upper bound −1µs, so features never leak
      // the label event itself). Same partition+order spec → Spark
      // stacks one WindowExec per distinct frame but they all ride the
      // SAME sort and single shuffle (PlanSpec pins ≤1 exchange, ≤2
      // sorts); the purchase filter then prunes output AFTER features
      // are computed from the full event stream.
      (s, d) => {
        def frame(secs: Long) = Window.partitionBy("user_id").orderBy(col("__us"))
          .rangeBetween(-secs * 1000000L, -1L)
        val e = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
            col("value"), unix_micros(col("ts")).as("__us"))
        e.withColumn("n_views_1h",
            count(when(col("event_type") === "view", lit(1))).over(frame(3600L)))
          .withColumn("n_views_24h",
            count(when(col("event_type") === "view", lit(1))).over(frame(86400L)))
          .withColumn("n_clicks_24h",
            count(when(col("event_type") === "click", lit(1))).over(frame(86400L)))
          .withColumn("spend_7d",
            round(coalesce(sum(when(col("event_type") === "purchase", col("value")))
              .over(frame(604800L)), lit(0.0)), 6).as("spend_7d"))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("n_views_1h"), col("n_views_24h"), col("n_clicks_24h"), col("spend_7d"))
          .orderBy(col("event_id"))
      },
      Some("WITH e AS (SELECT event_id, user_id, ts, event_type, value, " +
        "epoch_us(ts) AS us FROM events), " +
        "f AS (SELECT event_id, user_id, ts, event_type, " +
        "count(CASE WHEN event_type = 'view' THEN 1 END) OVER " +
        "(PARTITION BY user_id ORDER BY us RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING) AS n_views_1h, " +
        "count(CASE WHEN event_type = 'view' THEN 1 END) OVER " +
        "(PARTITION BY user_id ORDER BY us RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING) AS n_views_24h, " +
        "count(CASE WHEN event_type = 'click' THEN 1 END) OVER " +
        "(PARTITION BY user_id ORDER BY us RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING) AS n_clicks_24h, " +
        "round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END) OVER " +
        "(PARTITION BY user_id ORDER BY us RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING), 0.0), 6) AS spend_7d " +
        "FROM e) " +
        "SELECT event_id, user_id, ts, n_views_1h, n_views_24h, n_clicks_24h, spend_7d " +
        "FROM f WHERE event_type = 'purchase' ORDER BY event_id"),
      "multi-horizon as-of features (1h/24h/7d trailing frames, one window pass)"),

    "ts_trend" -> DeclaredQuery(
      // Rolling trend: least-squares slope of close vs bar index over
      // the trailing 20 bars (regr_slope as a WINDOW aggregate — both
      // engines support ordered-frame regression). Rides the shared
      // hourlyCloseBars stage, so the regression runs over bar counts,
      // not ticks. x = per-series bar index (row_number over the same
      // sort the frame uses — no extra pass). 6dp rounding absorbs the
      // ~1e-13 accumulation-order noise, as with corr/beta.
      (s, d) => {
        val ord = Window.partitionBy("event_type").orderBy(col("bar_ts"))
        val trail = ord.rowsBetween(-19, 0)
        hourlyCloseBars(s, d)
          .withColumn("__x", row_number().over(ord).cast("double"))
          .withColumn("__n", count(col("close")).over(trail))
          .withColumn("slope", regr_slope(col("close"), col("__x")).over(trail))
          .filter(col("__n") >= 10)
          .select(col("event_type"), col("bar_ts"), round(col("slope"), 6).as("slope"))
          .orderBy(col("event_type"), col("bar_ts"))
      },
      Some(s"WITH $HourlyCloseBarsSql, " +
        "x AS (SELECT event_type, bar_ts, close, " +
        "CAST(row_number() OVER (PARTITION BY event_type ORDER BY bar_ts) AS DOUBLE) AS xi FROM bars), " +
        "r AS (SELECT event_type, bar_ts, count(close) OVER w AS n, " +
        "regr_slope(close, xi) OVER w AS slope FROM x " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY bar_ts " +
        "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) " +
        "SELECT event_type, bar_ts, round(slope, 6) AS slope " +
        "FROM r WHERE n >= 10 ORDER BY event_type, bar_ts"),
      "rolling least-squares trend slope over hourly bars (regr_slope window)"),

    "ts_acf" -> DeclaredQuery(
      // Autocorrelation at 1-bar and 24-bar lags per series — the
      // seasonality detector (a daily cycle shows as high lag-24 ACF on
      // hourly bars). Lagged pairs come from the same single window
      // pass over the shared bar stage; corr() then collapses to
      // #series rows. Same rounding posture as ts_corr/ts_beta.
      (s, d) => {
        val ord = Window.partitionBy("event_type").orderBy(col("bar_ts"))
        hourlyCloseBars(s, d)
          .withColumn("__l1", lag(col("close"), 1).over(ord))
          .withColumn("__l24", lag(col("close"), 24).over(ord))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_bars"),
            round(corr(col("close"), col("__l1")), 6).as("acf_1"),
            round(corr(col("close"), col("__l24")), 6).as("acf_24"))
          .orderBy(col("event_type"))
      },
      Some(s"WITH $HourlyCloseBarsSql, " +
        "l AS (SELECT event_type, close, " +
        "lag(close, 1) OVER (PARTITION BY event_type ORDER BY bar_ts) AS l1, " +
        "lag(close, 24) OVER (PARTITION BY event_type ORDER BY bar_ts) AS l24 FROM bars) " +
        "SELECT event_type, count(*) AS n_bars, round(corr(close, l1), 6) AS acf_1, " +
        "round(corr(close, l24), 6) AS acf_24 " +
        "FROM l GROUP BY event_type ORDER BY event_type"),
      "autocorrelation at 1/24-bar lags per series (daily-cycle detector)"),

    "ts_macd" -> DeclaredQuery(
      // MACD(12, 26, 9) per series over the shared hourly bar stage —
      // three EWMA recurrences via the native Ewma window function
      // (expressions/EwmaWin.scala): ema12/ema26 ride ONE WindowExec
      // (same spec), and the signal line's second window pass reuses the
      // same (event_type) clustering, so the whole cascade costs one
      // shuffle after the bar aggregate. Alphas are spelled as the same
      // 2/(n+1) divisions on both engines, and the recurrence
      // `α·x + (1−α)·e` is literally Ewma's arithmetic — binary64
      // bit-identical, so 6dp-rounded outputs hash-match. `+ 0.0` in the
      // oracle absorbs the -0.0 sign Spark's round() drops.
      (s, d) => {
        import graft.functions.expressions.EwmaWin
        val pb = Seq(col("event_type")); val ob = Seq(col("bar_ts"))
        val withEmas = hourlyCloseBars(s, d)
          .select(col("event_type"), col("bar_ts"),
            EwmaWin.ewmaOver(col("close"), 2.0 / 13, pb, ob).as("__e12"),
            EwmaWin.ewmaOver(col("close"), 2.0 / 27, pb, ob).as("__e26"))
          .withColumn("__macd", col("__e12") - col("__e26"))
        withEmas
          .select(col("event_type"), col("bar_ts"), col("__macd"),
            EwmaWin.ewmaOver(col("__macd"), 0.2, pb, ob).as("__sig"))
          .select(col("event_type"), col("bar_ts"),
            round(col("__macd"), 6).as("macd"),
            round(col("__sig"), 6).as("signal_line"),
            round(col("__macd") - col("__sig"), 6).as("histogram"))
          .orderBy(col("event_type"), col("bar_ts"))
      },
      // ONE recursion carrying all three EWMA states (e12, e26, sig) —
      // chained recursive CTEs re-evaluate their upstream CTE per
      // iteration (quadratic blowup, measured as a hang at sf0.01);
      // carrying the state tuple keeps the oracle linear. sig_n uses
      // macd_n = e12_n − e26_n computed from the SAME step expressions,
      // exactly the value Spark derives from its window outputs.
      Some(s"WITH RECURSIVE $HourlyCloseBarsSql, " +
        "base AS (SELECT event_type, bar_ts, close, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY bar_ts) AS rn FROM bars), " +
        "r AS (SELECT event_type, bar_ts, rn, close AS e12, close AS e26, " +
        "close - close AS sig FROM base WHERE rn = 1 " +
        "UNION ALL SELECT b.event_type, b.bar_ts, b.rn, " +
        "(2.0/13) * b.close + (1 - 2.0/13) * r.e12, " +
        "(2.0/27) * b.close + (1 - 2.0/27) * r.e26, " +
        "0.2 * ((2.0/13) * b.close + (1 - 2.0/13) * r.e12 - " +
        "((2.0/27) * b.close + (1 - 2.0/27) * r.e26)) + 0.8 * r.sig " +
        "FROM r JOIN base b ON b.event_type = r.event_type AND b.rn = r.rn + 1) " +
        "SELECT event_type, bar_ts, round(e12 - e26, 6) + 0.0 AS macd, " +
        "round(sig, 6) + 0.0 AS signal_line, round(e12 - e26 - sig, 6) + 0.0 AS histogram " +
        "FROM r ORDER BY event_type, bar_ts"),
      "MACD(12,26,9) per series: three native-EWMA recurrences, one bar shuffle"),

    "ts_ewm_vol" -> DeclaredQuery(
      // EWMA volatility (RiskMetrics-style, span 9 ⇒ α=0.2) of hourly
      // close-to-close returns per series. Variance via the recursion
      // identity var_t = ewma(r²)_t − ewma(r)_t² — BOTH terms are plain
      // linear EWMA recurrences, so they ride the SAME native Ewma
      // window function (one WindowExec, two frames, one shuffle after
      // the bar aggregate) instead of needing a bespoke two-state
      // recursion. Return, subtraction, greatest and sqrt are IEEE-
      // identical across engines; α spelled 0.2 / (1 − 0.2) on both
      // sides exactly as Ewma computes it.
      (s, d) => {
        import graft.functions.expressions.EwmaWin
        val pb = Seq(col("event_type")); val ob = Seq(col("bar_ts"))
        hourlyReturns(s, d)
          .select(col("event_type"), col("bar_ts"), col("r"),
            EwmaWin.ewmaOver(col("r"), 0.2, pb, ob).as("__er"),
            EwmaWin.ewmaOver(col("r") * col("r"), 0.2, pb, ob).as("__er2"))
          .select(col("event_type"), col("bar_ts"),
            round(col("r"), 6).as("ret"),
            round(sqrt(greatest(col("__er2") - col("__er") * col("__er"), lit(0.0))), 6)
              .as("ewm_vol"))
          .orderBy(col("event_type"), col("bar_ts"))
      },
      // one recursion carrying BOTH EWMA states (er, er2) — same
      // state-tuple discipline as ts_macd (chained recursive CTEs
      // re-evaluate upstream per iteration)
      Some(s"WITH RECURSIVE $HourlyCloseBarsSql, $HourlyReturnsSql, " +
        "rr AS (SELECT event_type, bar_ts, r, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY bar_ts) AS rn FROM rets), " +
        "rec AS (SELECT event_type, bar_ts, rn, r, r AS er, r*r AS er2 " +
        "FROM rr WHERE rn = 1 " +
        "UNION ALL SELECT b.event_type, b.bar_ts, b.rn, b.r, " +
        "0.2 * b.r + (1 - 0.2) * rec.er, " +
        "0.2 * (b.r * b.r) + (1 - 0.2) * rec.er2 " +
        "FROM rec JOIN rr b ON b.event_type = rec.event_type AND b.rn = rec.rn + 1) " +
        "SELECT event_type, bar_ts, round(r, 6) + 0.0 AS ret, " +
        "round(sqrt(greatest(er2 - er * er, 0.0)), 6) + 0.0 AS ewm_vol " +
        "FROM rec ORDER BY event_type, bar_ts"),
      "EWMA volatility of hourly returns per series (two EWMA frames, one window pass)"),

    "ts_ewm_corr" -> DeclaredQuery(
      // Pairwise EWMA correlation (α=0.2) of hourly returns — the
      // rolling twin of ts_corr's static matrix. All FIVE sufficient
      // statistics (E[x], E[y], E[xy], E[x²], E[y²]) are plain linear
      // EWMA recurrences, so they ride ONE WindowExec partitioned by
      // the (tx, ty) pair — pairs parallelize across the cluster, each
      // pair's recurrence is sequential by nature (same note as
      // Bundles.align). corr = cov/√(vx·vy) from the raw (unrounded)
      // states; zero-variance prefixes surface as NULL via the same
      // CASE on both engines. Output: pair × bar_ts series, 6dp.
      (s, d) => {
        import graft.functions.expressions.EwmaWin
        val rets = hourlyReturns(s, d)
        val pairs = rets.as("a").join(rets.as("b"),
            col("a.bar_ts") === col("b.bar_ts") &&
              col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("tx"), col("b.event_type").as("ty"),
            col("a.bar_ts").as("bar_ts"), col("a.r").as("rx"), col("b.r").as("ry"))
        val pb = Seq(col("tx"), col("ty")); val ob = Seq(col("bar_ts"))
        def e(c: org.apache.spark.sql.Column) = EwmaWin.ewmaOver(c, 0.2, pb, ob)
        val st = pairs.select(col("tx"), col("ty"), col("bar_ts"),
          e(col("rx")).as("__ex"), e(col("ry")).as("__ey"),
          e(col("rx") * col("ry")).as("__exy"),
          e(col("rx") * col("rx")).as("__ex2"),
          e(col("ry") * col("ry")).as("__ey2"))
        val vp = (col("__ex2") - col("__ex") * col("__ex")) *
          (col("__ey2") - col("__ey") * col("__ey"))
        st.select(col("tx"), col("ty"), col("bar_ts"),
            when(vp > 0.0, round((col("__exy") - col("__ex") * col("__ey")) / sqrt(vp), 6))
              .as("ewm_corr"))
          .orderBy(col("tx"), col("ty"), col("bar_ts"))
      },
      Some(s"WITH RECURSIVE $HourlyCloseBarsSql, $HourlyReturnsSql, " +
        "p AS (SELECT a.event_type AS tx, b.event_type AS ty, a.bar_ts, " +
        "a.r AS rx, b.r AS ry, row_number() OVER " +
        "(PARTITION BY a.event_type, b.event_type ORDER BY a.bar_ts) AS rn " +
        "FROM rets a JOIN rets b ON a.bar_ts = b.bar_ts AND a.event_type < b.event_type), " +
        "rec AS (SELECT tx, ty, bar_ts, rn, rx AS ex, ry AS ey, rx*ry AS exy, " +
        "rx*rx AS ex2, ry*ry AS ey2 FROM p WHERE rn = 1 " +
        "UNION ALL SELECT b.tx, b.ty, b.bar_ts, b.rn, " +
        "0.2 * b.rx + (1 - 0.2) * rec.ex, " +
        "0.2 * b.ry + (1 - 0.2) * rec.ey, " +
        "0.2 * (b.rx * b.ry) + (1 - 0.2) * rec.exy, " +
        "0.2 * (b.rx * b.rx) + (1 - 0.2) * rec.ex2, " +
        "0.2 * (b.ry * b.ry) + (1 - 0.2) * rec.ey2 " +
        "FROM rec JOIN p b ON b.tx = rec.tx AND b.ty = rec.ty AND b.rn = rec.rn + 1) " +
        "SELECT tx, ty, bar_ts, CASE WHEN (ex2 - ex*ex) * (ey2 - ey*ey) > 0 " +
        "THEN round((exy - ex*ey) / sqrt((ex2 - ex*ex) * (ey2 - ey*ey)), 6) + 0.0 " +
        "ELSE NULL END AS ewm_corr FROM rec ORDER BY tx, ty, bar_ts"),
      "pairwise EWMA correlation of hourly returns (5 recurrences, one window pass per pair)"),

    "ts_heikin" -> DeclaredQuery(
      // Heikin-Ashi smoothed bars per series: ha_close is the plain
      // per-bar OHLC mean, but ha_open is RECURSIVE —
      // (ha_open₍ₙ₋₁₎ + ha_close₍ₙ₋₁₎)/2 — i.e. an EWMA(α=0.5) over the
      // lagged ha_close seeded with (open₁+close₁)/2, so the native Ewma
      // window function runs it in one O(n) pass. The lag/seed staging
      // window and the recurrence window share one (event_type)
      // clustering — one shuffle after the hourly bar aggregate. Every
      // expression is spelled with identical association on both engines;
      // the oracle carries the state in one recursive CTE (the ts_macd
      // lesson: chained recursions re-evaluate upstream per iteration).
      (s, d) => {
        import graft.functions.expressions.EwmaWin
        val aggs = graft.Q.ohlcAggs(col("ts"), col("event_id"), col("value"))
        val bars = Tables.events(s, d).filter(col("value").isNotNull)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bar_ts"))
          .agg(aggs.head, aggs.tail: _*)
        val ord = Window.partitionBy("event_type").orderBy(col("bar_ts"))
        val staged = bars
          .withColumn("__hc",
            (((col("open") + col("high")) + col("low")) + col("close")) / 4.0)
          .withColumn("__rn", row_number().over(ord))
          .withColumn("__x", when(col("__rn") === 1,
            (col("open") + col("close")) / 2.0)
            .otherwise(lag(col("__hc"), 1).over(ord)))
        staged.select(col("event_type"), col("bar_ts"),
            round(EwmaWin.ewmaOver(col("__x"), 0.5,
              Seq(col("event_type")), Seq(col("bar_ts"))), 6).as("ha_open"),
            round(col("__hc"), 6).as("ha_close"))
          .orderBy(col("event_type"), col("bar_ts"))
      },
      Some("WITH RECURSIVE bars AS (SELECT event_type, date_trunc('hour', ts) AS bar_ts, " +
        "first(value ORDER BY ts, event_id) AS open, max(value) AS high, min(value) AS low, " +
        "last(value ORDER BY ts, event_id) AS close FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
        "base AS (SELECT event_type, bar_ts, open, close, " +
        "(((open + high) + low) + close) / 4.0 AS hc, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY bar_ts) AS rn FROM bars), " +
        "r AS (SELECT event_type, bar_ts, rn, hc, (open + close) / 2.0 AS e FROM base WHERE rn = 1 " +
        "UNION ALL SELECT b.event_type, b.bar_ts, b.rn, b.hc, 0.5 * r.hc + 0.5 * r.e " +
        "FROM r JOIN base b ON b.event_type = r.event_type AND b.rn = r.rn + 1) " +
        "SELECT event_type, bar_ts, round(e, 6) + 0.0 AS ha_open, " +
        "round(hc, 6) + 0.0 AS ha_close FROM r ORDER BY event_type, bar_ts"),
      "Heikin-Ashi bars: recursive ha_open as a seeded native-EWMA pass")
  )
}
