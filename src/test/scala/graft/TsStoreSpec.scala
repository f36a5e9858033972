package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Tables, TsStore}

/** Round-trip / slice / validation semantics of the chunked store —
  * mirrors the reference's pytest round-trip suite (SURVEY §5.1).
  */
class TsStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables.events(spark, TestSpark.sf001)
  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("write → read round-trip preserves every row") {
    val dir = Files.createTempDirectory("graft_rt").toString
    TsStore.write(events, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val back = TsStore.read(spark, dir).select(cols.map(col): _*)
    val src = events.select(cols.map(col): _*)
    assert(back.count() === src.count())
    assert(back.except(src).count() === 0)
    assert(src.except(back).count() === 0)
  }

  test("sliced read has inclusive bounds on both ends") {
    val ts = events.orderBy("ts").select("ts").as[java.sql.Timestamp].take(5)
    val (lo, hi) = (ts.head, ts.last)
    val dir = Files.createTempDirectory("graft_slice").toString
    TsStore.write(events, dir, tsCol = "ts")
    val got = TsStore.read(spark, dir, start = Some(lo), end = Some(hi))
    assert(got.count() === 5)
    assert(got.filter(col("ts") === lit(lo)).count() === 1)
    assert(got.filter(col("ts") === lit(hi)).count() === 1)
  }

  test("column projection returns only requested columns") {
    val dir = Files.createTempDirectory("graft_proj").toString
    TsStore.write(events, dir, tsCol = "ts")
    val got = TsStore.read(spark, dir, columns = Seq("ts", "value"))
    assert(got.columns.toSeq === Seq("ts", "value"))
  }

  test("write refuses null timestamps (reference monotonicity validation)") {
    val bad = Seq((1L, Option.empty[java.sql.Timestamp], 1.0),
      (2L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), 2.0))
      .toDF("event_id", "ts", "value")
    assertThrows[IllegalArgumentException] {
      TsStore.write(bad, Files.createTempDirectory("graft_bad").toString, tsCol = "ts")
    }
  }

  test("strict monotonicity validation flags duplicate timestamps per uid") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dup = Seq((1L, t, 1L), (2L, t, 1L), (3L, t, 2L))
      .toDF("event_id", "ts", "user_id")
    assert(TsStore.validate(dup, "ts", Seq("user_id"), strictlyIncreasing = true) > 0)
    assert(TsStore.validate(dup, "ts", Seq("user_id")) === 0)
  }

  test("catalog listing matches per-uid extents") {
    val cat = TsStore.listSeries(events, uidCol = "user_id").collect()
    val n = events.select("user_id").distinct().count()
    assert(cat.length === n)
    assert(cat.map(_.getAs[Long]("n_rows")).sum === events.count())
  }
}
