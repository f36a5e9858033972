package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.expressions.EwmaWin
import graft.sources.Tables

/** The native Ewma window function: bit-equality against a driver-side
  * recurrence over the real fixture, and the null contract (leading nulls
  * stay null, a mid-stream null carries — ts_ffill semantics).
  */
class EwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ewma is bit-equal to the driver-computed recurrence on real events") {
    val got = Tables.events(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_id"),
        EwmaWin.ewmaOver(col("value"), 0.2,
          partitionBy = Seq(col("user_id")),
          orderBy = Seq(col("ts"), col("event_id"))).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    val rows = Tables.events(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      // full Timestamp precision (getTime alone truncates to millis and
      // could diverge from the window's (ts, event_id) order on a
      // same-millisecond pair)
      .sortBy(t => (t._1, t._3.getTime, t._3.getNanos, t._2))
    var cur = Map.empty[Long, Option[Double]]
    val want = rows.map { case (u, id, _, v) =>
      val e = (v, cur.getOrElse(u, None)) match {
        case (None, prev)          => prev
        case (Some(x), None)       => Some(x)
        case (Some(x), Some(p))    => Some(0.2 * x + 0.8 * p)
      }
      cur += u -> e
      (u, id) -> e
    }.toMap

    assert(got.size === want.size && got.nonEmpty)
    want.foreach { case (k, e) =>
      assert(got(k) === e, s"row $k: native ${got(k)} vs reference $e")
    }
  }

  test("null contract: leading nulls stay null, a mid-stream null carries") {
    val df = Seq(
      (1L, 1L, Option.empty[Double]),
      (1L, 2L, Some(10.0)),
      (1L, 3L, None),
      (1L, 4L, Some(20.0))).toDF("u", "id", "v")
    val got = df.select(col("id"),
      EwmaWin.ewmaOver(col("v"), 0.5,
        partitionBy = Seq(col("u")), orderBy = Seq(col("id"))).as("e"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got.toSeq === Seq(None, Some(10.0), Some(10.0), Some(15.0)))
  }

  test("SQL graft_ewma OVER (...) matches the DataFrame API result") {
    Tables.events(spark, TestSpark.sf001).limit(2000)
      .createOrReplaceTempView("ewma_ev")
    val sqlRows = spark.sql(
      "SELECT event_id, round(graft_ewma(value, 0.2) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS e " +
        "FROM ewma_ev ORDER BY event_id")
      .as[(Long, Option[Double])].collect()
    val dfRows = spark.table("ewma_ev")
      .select(col("event_id"),
        round(EwmaWin.ewmaOver(col("value"), 0.2,
          partitionBy = Seq(col("user_id")),
          orderBy = Seq(col("ts"), col("event_id"))), 6).as("e"))
      .orderBy("event_id").as[(Long, Option[Double])].collect()
    assert(sqlRows.nonEmpty && sqlRows.toSeq === dfRows.toSeq)
  }

  test("cusum: bit-equal to a driver loop; SQL graft_cusum matches the API") {
    import graft.functions.expressions.CusumWin
    val ev = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase").limit(500)
    ev.createOrReplaceTempView("cusum_ev")
    val got = ev.select(col("user_id"), col("event_id"), col("value"),
        CusumWin.cusumOver(col("value"), 55.0,
          partitionBy = Seq(col("user_id")),
          orderBy = Seq(col("ts"), col("event_id"))).as("s"))
      .orderBy("user_id", "event_id")
      .as[(Long, Long, Double, Double)].collect()
    // driver-computed recurrence over the same per-user order
    val expected = scala.collection.mutable.Map[(Long, Long), Double]()
    ev.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .orderBy("user_id", "ts", "event_id").collect()
      .groupBy(_.getLong(0)).foreach { case (_, rows) =>
        var s = 0.0
        rows.foreach { r =>
          s = math.max(0.0, s + (r.getDouble(3) - 55.0))
          expected((r.getLong(0), r.getLong(2))) = s
        }
      }
    got.foreach { case (u, id, _, s) =>
      assert(s === expected((u, id)), s"cusum mismatch at ($u, $id)")
      assert(s >= 0.0)
    }
    val sqlRows = spark.sql(
      "SELECT event_id, round(graft_cusum(value, 55.0) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS s " +
        "FROM cusum_ev ORDER BY event_id")
      .as[(Long, Double)].collect()
    val apiRows = got.sortBy(_._2).map(r => (r._2, math.rint(r._4 * 1e6) / 1e6))
    assert(sqlRows.nonEmpty && sqlRows.length === apiRows.length)
    sqlRows.zip(apiRows).foreach { case ((i1, s1), (i2, s2)) =>
      assert(i1 === i2 && math.abs(s1 - s2) < 1e-9)
    }
  }

  test("alpha outside (0, 1] is rejected at construction") {
    assertThrows[IllegalArgumentException](EwmaWin.ewma(col("v"), 0.0))
    assertThrows[IllegalArgumentException](EwmaWin.ewma(col("v"), 1.5))
  }
}
