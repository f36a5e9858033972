package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (FIXTURES.md).
  *
  * One parquet dataset per table under the scale-factor dir. Reads are
  * plain `spark.read.parquet` so Catalyst predicate pushdown / column
  * pruning reach the scan (`PushedFilters`, `ReadSchema` — verified in
  * PlanSpec). Schemas come from parquet footers; no inference cost.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read the raw int64 nanos via the legacy conf
    * and truncate to µs — the exact conversion DuckDB 1.0 applies when it
    * reads the same file, so both engines see identical timestamps.
    * (`ts div 1000` is integer division: no double rounding at 2^60 ns.)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
