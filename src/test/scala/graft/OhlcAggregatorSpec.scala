package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.OhlcAggregator
import graft.sources.Tables

/** The typed Aggregator must produce exactly the bars the built-in
  * min_by/max_by spelling (declared query agg_ohlc) produces.
  */
class OhlcAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Aggregator OHLC equals built-in min_by/max_by OHLC per (hour, type)") {
    import spark.implicits._
    val events = Tables.events(spark, TestSpark.sf001)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("bar_ts"),
        unix_micros(col("ts")).as("uts"), col("event_id"), col("value"))

    val viaAggregator = events
      .select(col("event_type"), unix_millis(col("bar_ts")).as("bar_ms"),
        col("uts"), col("event_id"), col("value"))
      .as[(String, Long, Long, Long, Double)]
      .groupByKey { case (t, b, _, _, _) => (t, b) }
      .mapValues { case (_, _, ts, id, v) => OhlcAggregator.Tick(ts, id, v) }
      .agg(OhlcAggregator.agg.toColumn.name("bar"))
      .map { case ((t, b), o) => (t, b, o.open, o.high, o.low, o.close, o.n) }
      .toDF("event_type", "bar_ms", "open", "high", "low", "close", "n")

    val viaBuiltin = events.groupBy("event_type", "bar_ts")
      .agg(min_by(col("value"), struct(col("uts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("uts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"))
      .select(col("event_type"), unix_millis(col("bar_ts")).as("bar_ms"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

    assert(viaAggregator.count() === viaBuiltin.count())
    assert(viaAggregator.except(viaBuiltin).count() === 0)
    assert(viaBuiltin.except(viaAggregator).count() === 0)
  }
}
