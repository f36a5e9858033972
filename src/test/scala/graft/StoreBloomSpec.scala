package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{StoreLog, Tables, TsStore}

/** Per-column parquet bloom filters as a store property: declared once at
  * write time, recorded in the manifest, and inherited by every rewrite
  * path — so row-group skipping on point/IN merge-key predicates (the
  * keyed-takedown find scan) survives upserts and deletes.
  */
class StoreBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bloomCols(storePath: String, rel: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(s"$storePath/$rel"), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      r.getRowGroups.asScala.flatMap { b =>
        b.getColumns.asScala.filter(_.getBloomFilterOffset >= 0)
          .map(_.getPath.toDotString)
      }.toSet
    } finally r.close()
  }

  test("bloomKeys write blooms, the manifest records them, rewrites inherit them") {
    val events = Tables.events(spark, TestSpark.sf001)
    val dir = Files.createTempDirectory("graft_bloom").toString
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), lit(1L).as("version"))
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"),
      bloomKeys = Seq("event_id"))
    val v1 = StoreLog.latest(dir).get
    assert(v1.bloomCols === Seq("event_id"))
    assert(v1.files.nonEmpty)
    v1.files.foreach { f =>
      val bc = bloomCols(dir, f)
      assert(bc.contains("event_id"), s"$f missing event_id bloom")
      assert(!bc.contains("user_id"), s"$f has an undeclared bloom")
    }
    // an upsert rewrite inherits the property without being told
    val delta = events.filter(col("event_type") === "purchase" && col("event_id") % 9 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") + 1.0).as("value"), lit(2L).as("version"))
    TsStore.upsert(spark, dir, delta, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    val v2 = StoreLog.latest(dir).get
    assert(v2.bloomCols === Seq("event_id"))
    val newFiles = v2.files.toSet -- v1.files.toSet
    assert(newFiles.nonEmpty)
    newFiles.foreach(f => assert(bloomCols(dir, f).contains("event_id"),
      s"rewritten $f lost the event_id bloom"))
    // a keyed delete's survivor rewrite keeps it too
    TsStore.delete(spark, dir, col("event_id") % 13 === 0,
      tsCol = "ts", uidCols = Seq("event_type"))
    val v3 = StoreLog.latest(dir).get
    assert(v3.bloomCols === Seq("event_id"))
    (v3.files.toSet -- v2.files.toSet).foreach(f =>
      assert(bloomCols(dir, f).contains("event_id")))
    // and the data survived the whole lifecycle
    val got = TsStore.load(spark, dir)
    val want = base.filter(!(col("event_id") % 13 === 0))
      .withColumn("value", when(col("event_type") === "purchase" &&
        col("event_id") % 9 === 0, col("value") + 1.0).otherwise(col("value")))
      .withColumn("version", when(col("event_type") === "purchase" &&
        col("event_id") % 9 === 0, 2L).otherwise(1L))
    assert(got.count() === want.count())
    assert(got.select("event_id", "value", "version")
      .except(want.select("event_id", "value", "version")).count() === 0)
  }

  test("a store without bloomKeys writes no blooms") {
    val events = Tables.events(spark, TestSpark.sf001)
    val dir = Files.createTempDirectory("graft_nobloom").toString
    TsStore.write(events, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val snap = StoreLog.ensure(dir)
    assert(snap.bloomCols.isEmpty)
    snap.files.take(3).foreach(f => assert(bloomCols(dir, f).isEmpty))
  }
}
