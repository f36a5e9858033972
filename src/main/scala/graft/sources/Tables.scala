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

  /** Time-sliced events read with the range predicate applied to the RAW
    * int64-nanos column BEFORE the µs conversion: a filter over
    * `timestamp_micros(ts div 1000)` cannot be pushed into the parquet
    * scan, so the plain spelling reads every row group. This one pushes
    * `ts >= startNs AND ts < endNs'` to the scan (row-group min/max
    * skipping — the corintick `(uid, start, end)` index behavior) with
    * bounds chosen so the result is EXACTLY `[start, end]` inclusive on
    * the truncated-µs timestamps: floor(v/1000) ≥ Sµs ⟺ v ≥ Sµs·1000 and
    * floor(v/1000) ≤ Eµs ⟺ v < (Eµs+1)·1000.
    */
  def eventsSliced(s: SparkSession, d: String, startUtc: String, endUtc: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def us(x: String): Long = {
      // epoch-micros derived from (second, nano) directly — toEpochMilli
      // would silently truncate sub-millisecond bound components.
      val i = java.time.LocalDateTime.parse(x.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val c = org.apache.spark.sql.functions.col("ts")
    table(s, d, "events")
      .filter(c >= us(startUtc) * 1000L && c < (us(endUtc) + 1L) * 1000L)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
