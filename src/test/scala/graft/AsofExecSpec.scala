package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** The custom as-of operator (AsofJoinPlan/Strategy/Exec) against the
  * union+window spelling: identical rows on the fixture and on the
  * hand-built tie/unmatched cases, and the expected physical shape.
  */
class AsofExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("custom exec equals the union+window asof on the events fixture") {
    val e = graft.sources.Tables.events(spark, TestSpark.sf001)
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val vW = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_event_id"), $"ts".as("view_ts"))
    val vN = e.filter($"event_type" === "view")
      .select($"user_id".as("v_uid"), $"event_id".as("view_event_id"), $"ts".as("view_ts"))

    val window = TimeSeries.asofJoin(p, vW, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"))
      .select($"event_id", $"view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    val native = TimeSeries.asofJoinNative(p, vN, leftKeys = Seq("user_id"),
      rightKeys = Seq("v_uid"), leftTs = "ts", rightTs = "view_ts",
      rightTieBreak = Seq("view_event_id"))
      .select($"event_id", $"view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(native.nonEmpty && native == window)
  }

  test("custom exec tolerance equals the union+window tolerance on the fixture") {
    val e = graft.sources.Tables.events(spark, TestSpark.sf001)
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val vW = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_event_id"), $"ts".as("view_ts"))
    val vN = e.filter($"event_type" === "view")
      .select($"user_id".as("v_uid"), $"event_id".as("view_event_id"), $"ts".as("view_ts"))
    val window = TimeSeries.asofJoin(p, vW, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"),
      tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .select($"event_id", $"view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    val native = TimeSeries.asofJoinNative(p, vN, leftKeys = Seq("user_id"),
      rightKeys = Seq("v_uid"), leftTs = "ts", rightTs = "view_ts",
      rightTieBreak = Seq("view_event_id"),
      toleranceMicros = Some(10L * 60 * 1000 * 1000))
      .select($"event_id", $"view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(native.nonEmpty && native == window)
    // the bound must actually bite somewhere on the fixture
    assert(window.values.exists(_.isEmpty))
  }

  test("custom exec: ties take the max tie-break; unmatched keys stay null") {
    val left = Seq((1L, 101L, ts("2024-01-01 00:00:05")),
      (1L, 102L, ts("2024-01-01 00:00:10")),
      (2L, 201L, ts("2024-01-01 00:00:01"))).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 11L, ts("2024-01-01 00:00:05")),
      (1L, 12L, ts("2024-01-01 00:00:05")),
      (1L, 13L, ts("2024-01-01 00:00:09"))).toDF("v_uid", "view_event_id", "view_ts")
    val out = TimeSeries.asofJoinNative(left, right, leftKeys = Seq("user_id"),
      rightKeys = Seq("v_uid"), leftTs = "ts", rightTs = "view_ts",
      rightTieBreak = Seq("view_event_id"))
      .select($"event_id", $"view_event_id")
      .orderBy($"event_id").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((101L, Some(12L)), (102L, Some(13L)), (201L, None)))
  }

  test("custom exec with a composite key matches the union+window path") {
    val left = Seq(
      (1L, "x", 101L, ts("2024-01-01 00:00:05")),
      (1L, "y", 102L, ts("2024-01-01 00:00:05")),  // same uid, other symbol
      (2L, "x", 201L, ts("2024-01-01 00:00:09"))
    ).toDF("uid", "sym", "event_id", "ts")
    val rightW = Seq(
      (1L, "x", 11L, ts("2024-01-01 00:00:04")),
      (1L, "y", 21L, ts("2024-01-01 00:00:03")),
      (2L, "y", 31L, ts("2024-01-01 00:00:01"))    // (2,x) has no match
    ).toDF("uid", "sym", "q_id", "q_ts")
    val rightN = rightW.toDF("r_uid", "r_sym", "q_id", "q_ts")
    val win = TimeSeries.asofJoin(left, rightW, keys = Seq("uid", "sym"),
      leftTs = "ts", rightTs = "q_ts", rightTieBreak = Seq("q_id"))
      .select($"event_id", $"q_id").as[(Long, Option[Long])].collect().toMap
    val nat = TimeSeries.asofJoinNative(left, rightN,
      leftKeys = Seq("uid", "sym"), rightKeys = Seq("r_uid", "r_sym"),
      leftTs = "ts", rightTs = "q_ts", rightTieBreak = Seq("q_id"))
      .select($"event_id", $"q_id").as[(Long, Option[Long])].collect().toMap
    assert(nat == win)
    assert(nat == Map(101L -> Some(11L), 102L -> Some(21L), 201L -> None))
  }

  test("custom exec survives a bare collect and a direct orderBy (UnsafeRow output)") {
    // No select() above the exec: parents that demand UnsafeRow (the
    // collect path's getByteArrayRdd, SortExec's sorter) must not see a
    // raw JoinedRow/GenericInternalRow.
    val left = Seq((1L, 101L, ts("2024-01-01 00:00:05")),
      (2L, 201L, ts("2024-01-01 00:00:01"))).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 11L, ts("2024-01-01 00:00:04"))).toDF("v_uid", "view_event_id", "view_ts")
    val joined = TimeSeries.asofJoinNative(left, right, leftKeys = Seq("user_id"),
      rightKeys = Seq("v_uid"), leftTs = "ts", rightTs = "view_ts")
    val bare = joined.collect() // would ClassCastException without the projection
    assert(bare.length == 2)
    val sorted = joined.orderBy($"view_event_id".desc_nulls_last).collect()
    assert(sorted.head.getAs[Long]("view_event_id") == 11L && sorted(1).isNullAt(4))
  }

  test("custom exec: NULL timestamps follow SQL comparison semantics") {
    val left = Seq((1L, 101L, Some(ts("2024-01-01 00:00:05"))),
      (1L, 102L, None), // null left ts: matches nothing
      (2L, 201L, Some(ts("2024-01-01 00:00:09")))).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 11L, Some(ts("2024-01-01 00:00:04"))),
      (2L, 21L, None)) // null right ts: never an as-of candidate
      .toDF("v_uid", "view_event_id", "view_ts")
    val out = TimeSeries.asofJoinNative(left, right, leftKeys = Seq("user_id"),
      rightKeys = Seq("v_uid"), leftTs = "ts", rightTs = "view_ts")
      .select($"event_id", $"view_event_id")
      .orderBy($"event_id").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((101L, Some(11L)), (102L, None), (201L, None)))
  }

  test("custom exec plans with one exchange per side and no window operator") {
    val df = Registry.all("join_asof_exec").fn(spark, TestSpark.sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p) // nodeName strips the Exec suffix
    assert(!p.contains("Window"), "no window buffering on the custom path")
  }

  test("graft_asof SQL table function round-trips the join_asof_exec rows") {
    // The TVF surface (GraftExtensions.injectTableFunction → AsofTvf):
    // plain spark.sql over two temp views must produce exactly the
    // declared join_asof_exec result, and plan through the custom exec.
    val e = graft.sources.Tables.events(spark, TestSpark.sf001)
    e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
      .createOrReplaceTempView("asof_purchases")
    e.filter($"event_type" === "view")
      .select($"user_id".as("v_uid"), $"event_id".as("view_event_id"),
        $"ts".as("view_ts"))
      .createOrReplaceTempView("asof_views")
    val sql = spark.sql(
      "SELECT event_id, ts, user_id, view_event_id, view_ts FROM graft_asof(" +
        "'asof_purchases', 'asof_views', 'user_id', 'v_uid', 'ts', 'view_ts', " +
        "'view_event_id') ORDER BY event_id")
    assert(sql.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "the TVF must plan through the custom exec")
    val declared = Registry.all("join_asof_exec").fn(spark, TestSpark.sf001)
    assert(sql.collect().toSeq === declared.collect().toSeq)
    // direction + tolerance arguments reach the exec: forward matches
    // the forward declared query
    val fwd = spark.sql(
      "SELECT event_id, ts, user_id, view_event_id, view_ts FROM graft_asof(" +
        "'asof_purchases', 'asof_views', 'user_id', 'v_uid', 'ts', 'view_ts', " +
        "'view_event_id', 'forward') ORDER BY event_id")
    val declaredFwd = Registry.all("join_asof_exec_fwd").fn(spark, TestSpark.sf001)
    assert(fwd.collect().toSeq === declaredFwd.collect().toSeq)
  }

  test("graft_asof rejects malformed arguments with actionable errors") {
    def fails(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(needle) ||
        Option(e.getCause).exists(_.getMessage.contains(needle)),
        s"expected '$needle' in: ${e.getMessage}")
    }
    fails("SELECT * FROM graft_asof('a', 'b')", "graft_asof expects")
    fails("SELECT * FROM graft_asof('a','b','k','k','ts','ts','','sideways')",
      "backward|forward|nearest")
    fails("SELECT * FROM graft_asof(1,'b','k','k','ts','ts')", "string literal")
  }
}
