package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native equivalent of the reference's chunked columnar timeseries
  * store (corintick: named series in LZ4-compressed MongoDB documents with
  * a `(uid, start, end)` index — `corintick/corintick.py::Corintick.write`
  * ~L100–160 / `.read` ~L60–100, reconstructed; see SURVEY.md §1).
  *
  * Mapping (SURVEY §1.2):
  *   - named series `uid`        → partition directory (`partitionBy(uid)`)
  *   - chunk `start`/`end` bounds → parquet row-group min/max stats on `ts`
  *     (rows are range-partitioned + sorted on write so row groups carry
  *     tight bounds → data skipping ≙ the Mongo compound index)
  *   - per-column LZ4 blob       → parquet column chunks (codec from conf)
  *   - metadata key/values       → ordinary columns; filters are predicates
  *
  * At 100 TB: writes shuffle once (`repartitionByRange`) producing
  * time-clustered files per uid; reads are pruned by partition (uid) and
  * row group (ts) before any executor touches data — no driver collect,
  * no full scans for sliced reads.
  */
object TsStore {

  /** Monotonicity / sanity validation analogous to the reference's
    * write-time checks (`Corintick._validate*` ~L80–100): the time column
    * must be non-null; if `strictlyIncreasing`, no duplicate timestamps
    * per uid. Returns the number of violations found (0 == valid).
    */
  def validate(df: DataFrame, tsCol: String, uidCols: Seq[String],
               strictlyIncreasing: Boolean = false): Long = {
    val nulls = df.filter(col(tsCol).isNull).count()
    if (nulls > 0) return nulls
    if (!strictlyIncreasing) 0L
    else {
      val w = if (uidCols.isEmpty) Window.orderBy(col(tsCol))
              else Window.partitionBy(uidCols.map(col): _*).orderBy(col(tsCol))
      df.select((col(tsCol) <= lag(col(tsCol), 1).over(w)).as("bad"))
        .filter(col("bad")).count()
    }
  }

  /** Chunked columnar write. Range-partition by (uid, ts) so each output
    * file covers a contiguous time slice of few uids (tight row-group
    * stats), sort within partitions by ts (monotonic chunks, as the
    * reference requires of its input), then write partitioned parquet.
    */
  def write(df: DataFrame, path: String, tsCol: String = "ts",
            uidCols: Seq[String] = Seq.empty,
            mode: SaveMode = SaveMode.Overwrite,
            codec: String = "zstd"): Unit = {
    require(validate(df, tsCol, uidCols) == 0, s"null $tsCol values — refusing write")
    val rangeCols: Seq[Column] = uidCols.map(col) :+ col(tsCol)
    val sorted = df.repartitionByRange(rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    // zstd default ≙ the reference's LZ4 column blobs: better ratio than
    // snappy at similar scan speed — at 100 TB the ratio IS the IO budget.
    val writer = sorted.write.mode(mode).option("compression", codec)
    (if (uidCols.nonEmpty) writer.partitionBy(uidCols: _*) else writer).parquet(path)
  }

  /** Sliced read — the reference's core entry point (`Corintick.read`):
    * uid + inclusive time range + column projection. All three conditions
    * are declarative predicates/projections, so Catalyst pushes them to
    * the parquet scan (partition pruning on uid, row-group skipping on
    * ts, column pruning) — the Spark analog of the Mongo
    * `{uid, start:{$lte:e}, end:{$gte:s}}` index scan + projection doc.
    */
  def read(spark: SparkSession, path: String,
           uid: Option[(String, Any)] = None,
           tsCol: String = "ts",
           start: Option[java.sql.Timestamp] = None,
           end: Option[java.sql.Timestamp] = None,
           columns: Seq[String] = Seq.empty,
           meta: Map[String, Any] = Map.empty,
           mergeSchema: Boolean = false): DataFrame = {
    // mergeSchema ≙ the reference's dynamic-schema read (SURVEY §1.1:
    // chunks of one uid may carry different column sets; read reassembles
    // the union, missing columns → null/NaN). Off by default: the footer
    // merge is a per-file metadata pass worth paying only for collections
    // that actually evolved.
    var df = spark.read.option("mergeSchema", mergeSchema).parquet(path)
    uid.foreach { case (c, v) => df = df.filter(col(c) === lit(v)) }
    start.foreach(s => df = df.filter(col(tsCol) >= lit(s)))
    end.foreach(e => df = df.filter(col(tsCol) <= lit(e)))
    // metadata key/values ≙ corintick's **meta kwargs on read: plain
    // equality predicates on attribute columns, pushed to the scan.
    meta.foreach { case (c, v) => df = df.filter(col(c) === lit(v)) }
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    df
  }

  /** Catalog listing ≙ `Corintick.list_uids` (Mongo $group aggregation):
    * per-series row count and time extent. Map-side partial aggregation
    * makes this a single cheap shuffle at any scale.
    */
  def listSeries(df: DataFrame, uidCol: String, tsCol: String = "ts"): DataFrame =
    df.groupBy(col(uidCol))
      .agg(count(lit(1)).as("n_rows"),
           min(col(tsCol)).as("ts_min"),
           max(col(tsCol)).as("ts_max"))
      .orderBy(col(uidCol))
}
