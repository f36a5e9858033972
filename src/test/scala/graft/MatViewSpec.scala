package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MatView, StoreLog, Tables, TsStore}

/** Incremental materialized-view maintenance: change-feed application
  * (with update preimages) must equal a full recompute at every step,
  * refresh must be idempotent, and a group netting to zero must vanish
  * from reads without a second commit.
  */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val measure = round(col("value") * 10000).cast("long")

  private def fullRecompute(storePath: String) =
    TsStore.load(spark, storePath).groupBy("user_id")
      .agg(sum(measure).cast("long").as("sum_e4"), count(lit(1)).as("cnt"))

  private def viewEqualsRecompute(storePath: String, viewPath: String): Unit = {
    val got = MatView.read(spark, viewPath, Seq("user_id"))
    val want = fullRecompute(storePath)
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("changes(preimages) emits the old row for every update and only updates") {
    val dir = Files.createTempDirectory("graft_pre").toString
    val base = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(1L).as("version"))
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val v1 = StoreLog.ensure(dir).version
    val delta = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase" && col("event_id") % 10 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") + 5.0).as("value"), lit(2L).as("version"))
    val nUpd = delta.count()
    val v2 = TsStore.upsert(spark, dir, delta, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    val ch = TsStore.changes(spark, dir, v1, v2, Seq("event_id"), "version",
      preimages = true)
    val byType = ch.groupBy("change_type").count().as[(String, Long)].collect().toMap
    assert(byType.getOrElse("update", 0L) === nUpd)
    assert(byType.getOrElse("update_preimage", 0L) === nUpd)
    assert(byType.getOrElse("insert", 0L) === 0L)
    assert(byType.getOrElse("delete", 0L) === 0L)
    // each preimage carries the OLD payload (version 1, original value)
    val pre = ch.filter(col("change_type") === "update_preimage")
    assert(pre.filter(col("version") =!= 1L).count() === 0)
    val joined = pre.select(col("event_id"), col("value").as("old_v"))
      .join(ch.filter(col("change_type") === "update")
        .select(col("event_id"), col("value").as("new_v")), "event_id")
    assert(joined.filter(abs(col("new_v") - col("old_v") - 5.0) > 1e-9).count() === 0)
  }

  test("view tracks the store through upsert and delete, step by step") {
    val sdir = Files.createTempDirectory("graft_mv_s").toString
    val vdir = Files.createTempDirectory("graft_mv_v").toString
    val base = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(1L).as("version"))
    TsStore.write(base, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    viewEqualsRecompute(sdir, vdir)
    // window 1: updates + inserts
    val delta = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase" && col("event_id") % 5 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") + 100.0).as("value"), lit(2L).as("version"))
      .unionByName(Tables.events(spark, TestSpark.sf001)
        .filter(col("event_id") % 101 === 0)
        .select((col("event_id") + 5000000L).as("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value"), lit(2L).as("version")))
    TsStore.upsert(spark, sdir, delta, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    val a1 = MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    viewEqualsRecompute(sdir, vdir)
    // refresh is idempotent on an empty window
    val a2 = MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    assert(a2 === a1)
    viewEqualsRecompute(sdir, vdir)
    // window 2: keyed delete
    TsStore.delete(spark, sdir,
      col("event_type") === "click" && col("event_id") % 3 === 0,
      tsCol = "ts", uidCols = Seq("event_type"))
    MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    viewEqualsRecompute(sdir, vdir)
  }

  test("follow maintains the view off the commit stream; a re-run is a no-op") {
    val root = Files.createTempDirectory("graft_mvf").toString
    val sdir = s"$root/store"; val vdir = s"$root/view"
    val base = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(1L).as("version"))
    TsStore.write(base, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    // three more upstream versions: two upserts + one delete
    def up(mod: Int, bump: Double, v: Long) = TsStore.upsert(spark, sdir,
      Tables.events(spark, TestSpark.sf001)
        .filter(col("event_type") === "purchase" && col("event_id") % mod === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          (col("value") + bump).as("value"), lit(v).as("version")),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    up(5, 10.0, 2L); up(3, 20.0, 3L)
    TsStore.delete(spark, sdir, col("event_type") === "view" && col("event_id") % 4 === 0,
      tsCol = "ts", uidCols = Seq("event_type"))
    val q1 = MatView.follow(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure, checkpoint = s"$root/ckpt")
    q1.awaitTermination()
    viewEqualsRecompute(sdir, vdir)
    val vAfter = StoreLog.latest(vdir).get.version
    // a second AvailableNow run on the same checkpoint sees no new
    // upstream commits: no view commit, state unchanged
    val q2 = MatView.follow(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure, checkpoint = s"$root/ckpt")
    q2.awaitTermination()
    assert(StoreLog.latest(vdir).get.version === vAfter)
    viewEqualsRecompute(sdir, vdir)
    // and a FRESH checkpoint (full source replay) is still a no-op: the
    // view's own applied-version bookkeeping, not the checkpoint, is
    // what makes re-delivery converge
    val q3 = MatView.follow(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure, checkpoint = s"$root/ckpt2")
    q3.awaitTermination()
    assert(StoreLog.latest(vdir).get.version === vAfter)
    viewEqualsRecompute(sdir, vdir)
  }

  test("a NULL group key accumulates as one group across refreshes") {
    val sdir = Files.createTempDirectory("graft_mvn_s").toString
    val vdir = Files.createTempDirectory("graft_mvn_v").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t0, Option(7L), "a", 10.0, 1L),
      (2L, t0, Option.empty[Long], "a", 20.0, 1L),
      (3L, t0, Option.empty[Long], "a", 30.0, 1L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "version")
    TsStore.write(rows, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    val delta = Seq((4L, t0, Option.empty[Long], "a", 40.0, 2L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "version")
    TsStore.upsert(spark, sdir, delta, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    val got = MatView.read(spark, vdir, Seq("user_id"))
    assert(got.count() === 2, "null must stay ONE group, not fork per refresh")
    val nullRow = got.filter(col("user_id").isNull).collect()
    assert(nullRow.length === 1)
    assert(nullRow.head.getAs[Long]("sum_e4") === 900000L) // (20+30+40)*1e4
    assert(nullRow.head.getAs[Long]("cnt") === 3L)
  }

  test("two concurrent refreshers converge: winner applies, loser no-ops or aborts clean") {
    val sdir = Files.createTempDirectory("graft_mvr_s").toString
    val vdir = Files.createTempDirectory("graft_mvr_v").toString
    val base = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(1L).as("version"))
    TsStore.write(base, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    TsStore.upsert(spark, sdir,
      Tables.events(spark, TestSpark.sf001)
        .filter(col("event_type") === "purchase" && col("event_id") % 4 === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          (col("value") + 33.0).as("value"), lit(2L).as("version")),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
    val threads = (0 until 2).map(_ => new Thread(() =>
      outcomes.add(
        try Right(MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
          Seq("user_id"), measure))
        catch { case e: Throwable => Left(e) })))
    threads.foreach(_.start()); threads.foreach(_.join(180000))
    import scala.jdk.CollectionConverters._
    val os = outcomes.asScala.toSeq
    assert(os.size === 2)
    // at least one racer applied; a loser may only fail with the clean
    // maintenance conflict
    assert(os.exists(_.isRight), s"both refreshers failed: $os")
    os.collect { case Left(e) => e }.foreach {
      case _: StoreLog.CommitConflict => ()
      case e => fail(s"refresh race died with a non-conflict error: $e")
    }
    viewEqualsRecompute(sdir, vdir)
  }

  test("empty-window refresh is O(1): manifest property, ZERO Spark jobs") {
    val root = Files.createTempDirectory("graft_mvo1").toString
    val sdir = s"$root/store"; val vdir = s"$root/view"
    val base = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(1L).as("version"))
    TsStore.write(base, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    val v = MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    // the resume point is a manifest property after init
    assert(StoreLog.latest(vdir).get.props(MatView.AppliedProp) === v.toString)
    // an up-to-date view refreshes off manifest metadata alone: no job
    // may start (no view data file read, no driver-side aggregate)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
        Seq("user_id"), measure)
      assert(got === v)
      Thread.sleep(500) // listener bus drain
      assert(jobs === 0, s"empty-window refresh must run zero jobs, ran $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    // after a real refresh the property advances WITH the upsert commit
    TsStore.upsert(spark, sdir,
      Tables.events(spark, TestSpark.sf001)
        .filter(col("event_type") === "purchase" && col("event_id") % 6 === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          (col("value") + 5.0).as("value"), lit(2L).as("version")),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    val v2 = MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    assert(v2 > v)
    assert(StoreLog.latest(vdir).get.props(MatView.AppliedProp) === v2.toString)
    viewEqualsRecompute(sdir, vdir)
  }

  test("pre-upgrade view (no property) falls back to the scan, then upgrades") {
    val root = Files.createTempDirectory("graft_mvup").toString
    val sdir = s"$root/store"; val vdir = s"$root/view"
    val base = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(1L).as("version"))
    TsStore.write(base, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    // simulate a pre-upgrade view: delete the property (empty value)
    val cur = StoreLog.latest(vdir).get
    StoreLog.commit(vdir, cur.version, Seq.empty, cur.files,
      parent = Some(cur), setProps = Map(MatView.AppliedProp -> ""))
    assert(!StoreLog.latest(vdir).get.props.contains(MatView.AppliedProp))
    // refresh still resumes correctly (per-row applied_v scan) ...
    TsStore.upsert(spark, sdir,
      Tables.events(spark, TestSpark.sf001)
        .filter(col("event_type") === "click" && col("event_id") % 9 === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          (col("value") * 2.0).as("value"), lit(2L).as("version")),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    val v2 = MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    viewEqualsRecompute(sdir, vdir)
    // ... and the property rides the refresh commit (upgraded in place)
    assert(StoreLog.latest(vdir).get.props(MatView.AppliedProp) === v2.toString)
  }

  test("a held refresh lock rejects a second maintainer with the clean conflict") {
    val root = Files.createTempDirectory("graft_mvlk").toString
    val sdir = s"$root/store"; val vdir = s"$root/view"
    val base = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(1L).as("version"))
    TsStore.write(base, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    TsStore.upsert(spark, sdir,
      Tables.events(spark, TestSpark.sf001)
        .filter(col("event_type") === "purchase" && col("event_id") % 8 === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          (col("value") + 1.0).as("value"), lit(2L).as("version")),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    // plant a FRESH foreign lock: refresh must not proceed underneath a
    // live maintainer — after the bounded wait it throws the same
    // maintenance-conflict signal callers already skip on. (Patch the
    // wait down via the lock's mtime: a lock aged past LockWaitMs but
    // inside LockStaleMs still blocks, so use a short-lived thread.)
    val lock = new java.io.File(s"${StoreLog.logDir(vdir)}/.refresh_lock")
    assert(lock.createNewFile())
    val t = new Thread(() => { Thread.sleep(3000); lock.delete(); () })
    t.start()
    // the refresh WAITS while the lock is held, then proceeds once the
    // "maintainer" releases — serialized, window applied exactly once
    val v2 = MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    t.join()
    assert(v2 === StoreLog.latest(sdir).get.version)
    viewEqualsRecompute(sdir, vdir)
    // a stale lock (crashed holder) is reclaimed: age one past the
    // expiry, give refresh a NON-EMPTY window (the fast path would
    // otherwise return before ever touching the lock), and it must
    // reclaim + apply without waiting out the stale holder
    TsStore.upsert(spark, sdir,
      Tables.events(spark, TestSpark.sf001)
        .filter(col("event_type") === "view" && col("event_id") % 13 === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          (col("value") + 2.0).as("value"), lit(3L).as("version")),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    assert(lock.createNewFile())
    assert(lock.setLastModified(
      System.currentTimeMillis() - MatView.LockStaleMs - 60000))
    val v3 = MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    assert(v3 > v2, "stale lock must be reclaimed, window applied")
    viewEqualsRecompute(sdir, vdir)
  }

  test("refresh lock: heartbeat renews a long-running holder; owned() tracks loss; stale takeover is content-matched") {
    val root = Files.createTempDirectory("graft_mvhb").toString
    val vdir = s"$root/view"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(StoreLog.logDir(vdir)))
    val lock = new java.io.File(s"${StoreLog.logDir(vdir)}/.refresh_lock")
    // 1) heartbeat: a holder whose body outlives several heartbeat
    // periods keeps the lock's mtime fresh — a healthy long refresh is
    // never reclaimable as stale
    val prevHb = MatView.LockHeartbeatMs
    MatView.LockHeartbeatMs = 150L
    try {
      MatView.withRefreshLock(vdir) { owned =>
        assert(owned(), "holder must own the lock it just acquired")
        val m0 = lock.lastModified()
        // age the lock artificially; the heartbeat must touch it back
        assert(lock.setLastModified(m0 - 60000))
        Thread.sleep(600)
        assert(lock.lastModified() > m0 - 60000,
          "heartbeat must renew the held lock's mtime while the body runs")
        // 2) owned(): lose the lock to a foreign takeover mid-body —
        // the pre-commit check must see it
        assert(lock.delete())
        java.nio.file.Files.write(lock.toPath, "foreign".getBytes("UTF-8"))
        assert(!owned(), "a replaced lock must read as not-owned")
      }
    } finally MatView.LockHeartbeatMs = prevHb
    // release must NOT have deleted the foreign successor's lock
    assert(lock.exists(), "release deleted a lock it did not own")
    assert(new String(java.nio.file.Files.readAllBytes(lock.toPath), "UTF-8") === "foreign")
    lock.delete()

    // 3) content-matched stale delete: a STALE lock is taken over, and
    // after the takeover the new holder's own token survives its body
    java.nio.file.Files.write(lock.toPath, "crashed-holder".getBytes("UTF-8"))
    assert(lock.setLastModified(
      System.currentTimeMillis() - MatView.LockStaleMs - 60000))
    val ran = MatView.withRefreshLock(vdir) { owned =>
      assert(owned()); 42
    }
    assert(ran === 42)
    assert(!lock.exists(), "takeover holder must release its own lock")
  }

  test("a group netting to zero disappears from reads (cnt=0 tombstone)") {
    val sdir = Files.createTempDirectory("graft_mv0_s").toString
    val vdir = Files.createTempDirectory("graft_mv0_v").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "a", 10.0, 1L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "a", 20.0, 1L),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 9L, "a", 30.0, 1L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "version")
    TsStore.write(rows, sdir, tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(sdir)
    MatView.init(spark, sdir, vdir, Seq("user_id"), measure)
    assert(MatView.read(spark, vdir, Seq("user_id")).count() === 2)
    // delete every user-7 row: the group must vanish from reads
    TsStore.delete(spark, sdir, col("user_id") === 7L,
      tsCol = "ts", uidCols = Seq("event_type"))
    MatView.refresh(spark, sdir, vdir, Seq("event_id"), "version",
      Seq("user_id"), measure)
    val got = MatView.read(spark, vdir, Seq("user_id"))
    assert(got.count() === 1)
    assert(got.select("user_id").as[Long].head() === 9L)
    // the tombstone row still exists in the raw view (one-commit refresh)
    assert(TsStore.load(spark, vdir).filter(col("cnt") === 0).count() === 1)
  }
}
