package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All declared queries live in the operator modules and are assembled by
  * [[Registry]]; this object is only the driver-facing glue.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Corintick's reason-to-exist in one plan: slice a timeseries by time
    * range (predicate pushed to the parquet scan), resample to hourly
    * OHLC bars per series (hash aggregate, map-side combined).
    */
  def entry(spark: SparkSession): DataFrame = {
    // eventsSliced applies the range to the RAW int64-nanos column, so the
    // bounds actually reach the parquet scan (row-group min/max skipping).
    val events = graft.sources.Tables.eventsSliced(spark, "/root/testdata/sf0.001",
      "2024-01-05 00:00:00", "2024-01-12 00:00:00")
    val aggs = Q.ohlcAggs(col("ts"), col("event_id"), col("value")) :+
      count(lit(1)).as("n")
    events.groupBy(date_trunc("hour", col("ts")).as("bar_ts"), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("bar_ts"), col("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
