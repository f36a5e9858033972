package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** As-of join semantics on a hand-built fixture: `right.ts <= left.ts`,
  * latest (ts, tie-break) wins, unmatched left rows keep nulls.
  */
class AsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("nearest: equal-ts candidates and equal distances resolve like the oracle") {
    // the property generator never produces equal timestamps, so the
    // tie branches are pinned here: among equal-ts candidates the
    // backward frame takes the MAX tie-break, the forward frame the MIN;
    // equal |distance| between directions goes backward
    val left = Seq(
      (1L, 101L, ts("2024-01-01 00:10:00")),  // rights at ±10min, ids (1,2)@-10 (3,4)@+10
      (2L, 201L, ts("2024-01-01 00:10:00")))  // rights exactly AT ts, ids 5,6
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")), (1L, 2L, ts("2024-01-01 00:00:00")),
      (1L, 3L, ts("2024-01-01 00:20:00")), (1L, 4L, ts("2024-01-01 00:20:00")),
      (2L, 5L, ts("2024-01-01 00:10:00")), (2L, 6L, ts("2024-01-01 00:10:00")))
      .toDF("user_id", "view_event_id", "view_ts")
    val out = TimeSeries.asofJoinNearest(left, right, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"))
      .orderBy("event_id").select("event_id", "view_event_id")
      .as[(Long, Long)].collect().toMap
    // user 1: dPrev == dNext == 10min → backward; backward tie → max id 2
    assert(out(101L) === 2L)
    // user 2: distance 0 both ways → backward frame's max id among equal ts
    assert(out(201L) === 6L)
  }

  test("native nearest with tolerance bounds each direction independently") {
    // left at 00:20 — prev at 00:00 (20m behind), next at 00:25 (5m ahead)
    // tol 10m: prev invalid, next valid → next wins even though |dPrev|
    // would lose untolerated too; left at 00:02 — only prev at 00:00 is
    // in range (next 23m ahead) → prev; left at 01:30 — nothing in tol
    val left = Seq(
      (1L, 101L, ts("2024-01-01 00:20:00")),
      (1L, 102L, ts("2024-01-01 00:02:00")),
      (1L, 103L, ts("2024-01-01 01:30:00")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 11L, ts("2024-01-01 00:00:00")),
      (1L, 12L, ts("2024-01-01 00:25:00")))
      .toDF("v_uid", "view_event_id", "view_ts")
    val out = TimeSeries.asofJoinNative(left, right,
      leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
      leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"),
      toleranceMicros = Some(10L * 60 * 1000 * 1000), nearest = true)
      .select("event_id", "view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out === Map(101L -> Some(12L), 102L -> Some(11L), 103L -> None))
  }

  test("tolerance nulls out matches staler than the bound, keeps fresh ones") {
    val left = Seq(
      (1L, 101L, ts("2024-01-01 00:10:00")),  // nearest view 9 min old → match
      (1L, 102L, ts("2024-01-01 00:30:00")),  // nearest view 21 min old → too stale
      (1L, 103L, ts("2024-01-01 00:09:00")))  // exactly at the 10-min bound → match
      .toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 11L, ts("2024-01-01 00:01:00")),
      (1L, 12L, ts("2024-01-01 00:09:00")))
      .toDF("user_id", "view_event_id", "view_ts")
    val out = TimeSeries.asofJoin(left, right, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"),
      tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .orderBy("event_id").select("event_id", "view_event_id")
      .as[(Long, Option[Long])].collect()
    assert(out === Array((101L, Some(12L)), (102L, None), (103L, Some(12L))))
  }

  test("asof join picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, 101L, ts("2024-01-01 00:00:05")),
      (1L, 102L, ts("2024-01-01 00:00:10")),
      (2L, 201L, ts("2024-01-01 00:00:01"))
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 11L, ts("2024-01-01 00:00:05")), // tie with left@5
      (1L, 12L, ts("2024-01-01 00:00:05")), // same ts, larger id — must win the tie
      (1L, 13L, ts("2024-01-01 00:00:09"))
    ).toDF("user_id", "view_event_id", "view_ts")

    val out = TimeSeries.asofJoin(left, right, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"))
      .orderBy("event_id")
      .select("event_id", "view_event_id")
      .as[(Long, Option[Long])].collect()

    assert(out === Array(
      (101L, Some(12L)), // ts tie included (<=), tie-break by max id
      (102L, Some(13L)), // latest preceding
      (201L, None)       // no right rows for user 2 → left outer null
    ))
  }

  test("forward asof picks the earliest right row at or after each left ts") {
    val left = Seq(
      (1L, 101L, ts("2024-01-01 00:00:05")),
      (1L, 102L, ts("2024-01-01 00:00:10")),
      (2L, 201L, ts("2024-01-01 00:00:01"))
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 11L, ts("2024-01-01 00:00:05")), // tie with left@5 — smaller id must win
      (1L, 12L, ts("2024-01-01 00:00:05")),
      (1L, 13L, ts("2024-01-01 00:00:09"))  // before left@10 → no match forward
    ).toDF("user_id", "view_event_id", "view_ts")

    val out = TimeSeries.asofJoin(left, right, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "view_ts", rightTieBreak = Seq("view_event_id"),
      forward = true)
      .orderBy("event_id")
      .select("event_id", "view_event_id")
      .as[(Long, Option[Long])].collect()

    assert(out === Array(
      (101L, Some(11L)), // ts tie included (>=), tie-break by MIN id
      (102L, None),      // nothing at or after 00:00:10
      (201L, None)
    ))
  }
}
