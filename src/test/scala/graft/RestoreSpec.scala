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

  test("detail reports live files, sizes, partitions, and recorded bounds") {
    val events = Tables.events(spark, TestSpark.sf001)
    val dir = Files.createTempDirectory("graft_detail").toString
    val base = events.select((cols.map(col) :+ lit(1L).as("version")): _*)
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val v1 = StoreLog.ensure(dir).version
    val d = TsStore.detail(spark, dir).collect()
    val snap = StoreLog.latest(dir).get
    assert(d.length === snap.files.size)
    d.foreach { r =>
      val f = r.getString(0)
      assert(snap.files.contains(f))
      assert(r.getString(1).startsWith("event_type="))
      assert(r.getLong(2) === new java.io.File(s"$dir/$f").length())
      val stats = r.getMap[String, org.apache.spark.sql.Row](3)
      assert(stats.contains("ts"), s"$f missing recorded ts bounds")
      val ts = stats("ts")
      assert(ts.getString(0) === "ts" && ts.getString(1).toLong <= ts.getString(2).toLong)
    }
    // after an upsert, detail(asOf = v1) still describes the old set
    TsStore.upsert(spark, dir,
      base.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") + 1.0).withColumn("version", lit(2L)),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    val old = TsStore.detail(spark, dir, asOf = Some(v1)).collect().map(_.getString(0)).toSet
    assert(old === snap.files.toSet)
    assert(TsStore.detail(spark, dir).collect().map(_.getString(0)).toSet !== old)
  }

  test("restore racing an append: append always lands; restore wins or aborts cleanly") {
    import spark.implicits._
    val events = Tables.events(spark, TestSpark.sf001)
    val dir = Files.createTempDirectory("graft_restore_race").toString
    val base = events.select((cols.map(col) :+ lit(1L).as("version")): _*)
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val v1 = StoreLog.ensure(dir).version
    TsStore.upsert(spark, dir,
      base.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") + 500.0).withColumn("version", lit(2L)),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    val appended = (0 until 5).map(i =>
      (900000L + i, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 1L,
        "raced", 1.0, 3L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "version")
    @volatile var restoreOutcome: Either[Throwable, Long] = Left(new Exception("unset"))
    val tRestore = new Thread(() => {
      restoreOutcome =
        try Right(TsStore.restore(spark, dir, v1))
        catch { case e: Throwable => Left(e) }
    })
    val tAppend = new Thread(() =>
      TsStore.write(appended, dir, tsCol = "ts", uidCols = Seq("event_type"),
        mode = org.apache.spark.sql.SaveMode.Append,
        overlapPolicy = TsStore.OverlapPolicy.Allow))
    tRestore.start(); tAppend.start()
    tRestore.join(120000); tAppend.join(120000)
    // the append is a pure file addition with a rebase loop — it may
    // never be lost, whatever the restore did
    val live = TsStore.load(spark, dir)
    assert(live.filter(col("event_type") === "raced").count() === 5,
      "append lost in the race")
    restoreOutcome match {
      case Right(v) =>
        // restore committed: purchases are back at their v1 values
        assert(v > v1)
        assert(live.filter(col("value") > 1000.0 && col("event_type") === "purchase")
          .count() === 0, "restore committed but v2 rows are still live")
      case Left(_: StoreLog.CommitConflict) =>
        // clean abort: the v2 state (plus the append) is intact
        assert(live.filter(col("event_type") === "purchase" && col("version") === 2L)
          .count() > 0)
      case Left(e) => fail(s"restore died with a non-conflict error: $e")
    }
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
