package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Instance facade over [[TsStore]] mirroring the reference's client
  * object model (`corintick/corintick.py::Corintick`): a base path plays
  * the MongoDB database, a named **collection** (bundle) per series
  * frequency/source plays a Mongo collection — here a subdirectory
  * holding one partitioned parquet dataset. A user of the reference maps
  * 1:1:
  *
  * {{{
  * val ct = new Bundles(spark, "/data/ticks")          // Corintick(config)
  * ct.write("AAPL", df)                                 // ct.write(uid, df)
  * ct.read("AAPL", start = ..., end = ...,
  *         columns = Seq("bid", "ask"))                 // ct.read(...)
  * ct.listUids()                                        // ct.list_uids()
  * }}}
  *
  * Series metadata travels as ordinary columns (so it is filterable by
  * predicate pushdown); the uid is a partition column (`__uid`), giving
  * the `(uid, start, end)`-index behavior via partition pruning +
  * row-group stats.
  */
class Bundles(spark: SparkSession, basePath: String,
              defaultCollection: String = "default") {

  private def dir(collection: String) = s"$basePath/$collection"

  val UidCol = "__uid"

  /** Write one named series (appends as new files of the uid partition). */
  def write(uid: String, df: DataFrame, collection: String = defaultCollection,
            tsCol: String = "ts",
            mode: SaveMode = SaveMode.Append,
            metadata: Map[String, Any] = Map.empty): Unit = {
    var tagged = df.withColumn(UidCol, org.apache.spark.sql.functions.lit(uid))
    metadata.foreach { case (k, v) =>
      // constrain metadata to literal-able scalar types up front — lit()
      // on anything else throws an opaque runtime exception mid-write
      val c = v match {
        case x: String  => org.apache.spark.sql.functions.lit(x)
        case x: Int     => org.apache.spark.sql.functions.lit(x)
        case x: Long    => org.apache.spark.sql.functions.lit(x)
        case x: Double  => org.apache.spark.sql.functions.lit(x)
        case x: Boolean => org.apache.spark.sql.functions.lit(x)
        case other => throw new IllegalArgumentException(
          s"metadata '$k': unsupported type ${other.getClass.getName} " +
            "(use String/Int/Long/Double/Boolean)")
      }
      tagged = tagged.withColumn(k, c)
    }
    // appending a chunk whose column set diverges from the existing
    // collection would silently produce per-file schema drift; fail fast
    if (mode == SaveMode.Append) {
      try {
        val existing = spark.read.parquet(dir(collection)).columns.toSet
        val incoming = tagged.columns.toSet
        require(existing == incoming,
          s"schema drift on append to '$collection': existing=${existing.toSeq.sorted
            .mkString(",")} incoming=${incoming.toSeq.sorted.mkString(",")}")
      } catch { case _: org.apache.spark.sql.AnalysisException => () /* first write */ }
    }
    TsStore.write(tagged, dir(collection), tsCol = tsCol,
      uidCols = Seq(UidCol), mode = mode)
  }

  /** Sliced read of one series: uid + inclusive range + projection +
    * metadata equality filters — the reference's core entry point.
    */
  def read(uid: String, collection: String = defaultCollection,
           tsCol: String = "ts",
           start: Option[java.sql.Timestamp] = None,
           end: Option[java.sql.Timestamp] = None,
           columns: Seq[String] = Seq.empty,
           meta: Map[String, Any] = Map.empty): DataFrame = {
    val cols = if (columns.nonEmpty) (Seq(tsCol) ++ columns).distinct else columns
    TsStore.read(spark, dir(collection), uid = Some((UidCol, uid)),
      tsCol = tsCol, start = start, end = end, columns = cols, meta = meta)
  }

  /** Per-series row counts and time extents ≙ `list_uids`. */
  def listUids(collection: String = defaultCollection,
               tsCol: String = "ts"): DataFrame =
    TsStore.listSeries(spark.read.parquet(dir(collection)), UidCol, tsCol)
}
