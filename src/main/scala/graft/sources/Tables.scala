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
  /** Resolved-relation memo per (session, path): `spark.read.parquet`
    * re-lists the directory and re-reads footer schemas on EVERY call,
    * and the fixture tables are immutable inputs read by nearly every
    * query — across a full bench run the repeated driver-side
    * resolution alone costs whole seconds. The memo holds the LAZY
    * plan handle only (no rows, no results — every action still
    * computes from the parquet files); sessions are weak keys so a
    * stopped test session never pins its entries.
    */
  private val resolved =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.HashMap[String, DataFrame]]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    resolved.synchronized {
      var m = resolved.get(spark)
      if (m == null) {
        m = scala.collection.mutable.HashMap.empty[String, DataFrame]
        resolved.put(spark, m)
      }
      val p = s"$sfDir/$name.parquet"
      m.getOrElseUpdate(p, spark.read.parquet(p))
    }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts normalization. The fixture has shipped with two physical
    * spellings of the column:
    *  - parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    *    (PARQUET_TYPE_ILLEGAL) — read the raw int64 nanos via the legacy
    *    conf and truncate to µs, the exact conversion DuckDB applies when
    *    it reads the same file (`ts div 1000` is integer division: no
    *    double rounding at 2^60 ns);
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4
    *    reads as TIMESTAMP_NTZ — cast to TIMESTAMP (session tz is pinned
    *    UTC everywhere, so the epoch-µs value is preserved bit-for-bit
    *    and matches DuckDB's naive-timestamp read).
    * Both paths yield the same TimestampType column, so every downstream
    * operator and oracle is schema-agnostic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
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
    import org.apache.spark.sql.functions.col
    def us(x: String): Long = {
      // epoch-micros derived from (second, nano) directly — toEpochMilli
      // would silently truncate sub-millisecond bound components.
      val i = java.time.LocalDateTime.parse(x.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.filter(col("ts") >= us(startUtc) * 1000L && col("ts") < (us(endUtc) + 1L) * 1000L)
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // Native µs timestamp: filter on the RAW column with literals of its
        // own type (NTZ literals for an NTZ column) so the range predicate
        // pushes into the parquet scan (row-group min/max skipping), THEN
        // normalize to TimestampType.
        val tsType = df.schema("ts").dataType
        def bound(x: String) = org.apache.spark.sql.functions
          .lit(java.time.LocalDateTime.parse(x.replace(' ', 'T'))).cast(tsType)
        val sliced = df.filter(col("ts") >= bound(startUtc) && col("ts") <= bound(endUtc))
        if (tsType == org.apache.spark.sql.types.TimestampType) sliced
        else sliced.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
