package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileStats, StoreLog, Tables, TsStore}

/** RESTORE-to-version: one manifest commit walks back any sequence of
  * mistakes; the bad versions stay auditable; vacuum reclaims them.
  */
class RestoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value")

  test("restore walks back an upsert and a delete; bad versions stay auditable") {
    val events = Tables.events(spark, TestSpark.sf001)
    val dir = Files.createTempDirectory("graft_restore").toString
    val base = events.select((cols.map(col) :+ lit(1L).as("version")): _*)
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val v1 = StoreLog.ensure(dir).version
    val botched = base.filter(col("event_type") === "purchase")
      .withColumn("value", col("value") + 1e6)
      .withColumn("version", lit(2L))
    val v2 = TsStore.upsert(spark, dir, botched, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    val v3 = TsStore.delete(spark, dir, col("event_type") === "click",
      tsCol = "ts", uidCols = Seq("event_type"))
    val v4 = TsStore.restore(spark, dir, v1)
    assert(v4 > v3 && v3 > v2 && v2 > v1)
    // live view == the original base, byte for byte
    val got = TsStore.load(spark, dir).select((cols.map(col) :+ col("version")): _*)
    val want = base
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
    // the botched versions are still auditable asOf
    assert(TsStore.load(spark, dir, asOf = Some(v3))
      .filter(col("event_type") === "click").count() === 0)
    assert(TsStore.load(spark, dir, asOf = Some(v2))
      .filter(col("value") > 1e6).count() > 0)
    // restored manifest carries the restored files' stats — ts pruning
    // still engages exactly as it did at v1
    val snap = StoreLog.latest(dir).get
    assert(snap.version === v4)
    assert(snap.stats.nonEmpty)
    val tsLo = events.agg(min(col("ts"))).first().getTimestamp(0)
    val kept = FileStats.prune(snap.files, snap.stats, col("ts") < lit(tsLo))
    assert(kept.size < snap.files.size,
      "an impossible ts predicate must prune restored files via their stats")
    // restore to the current version is a no-op
    assert(TsStore.restore(spark, dir, v4) === v4)
    // a restore OF the restore round-trips back to the bad state
    val v5 = TsStore.restore(spark, dir, v3)
    assert(v5 > v4)
    assert(TsStore.load(spark, dir).filter(col("event_type") === "click").count() === 0)
  }

  test("vacuum after restore reclaims the bad versions' files, live view intact") {
    val events = Tables.events(spark, TestSpark.sf001)
    val dir = Files.createTempDirectory("graft_restore_vac").toString
    val base = events.select((cols.map(col) :+ lit(1L).as("version")): _*)
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val v1 = StoreLog.ensure(dir).version
    TsStore.upsert(spark, dir,
      base.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") * 0.0).withColumn("version", lit(2L)),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    TsStore.restore(spark, dir, v1)
    val reclaimed = StoreLog.vacuum(dir)
    assert(reclaimed > 0, "the botched upsert's files should be reclaimable")
    val got = TsStore.load(spark, dir).select((cols.map(col) :+ col("version")): _*)
    assert(got.count() === base.count())
    assert(got.except(base).count() === 0)
  }
}
