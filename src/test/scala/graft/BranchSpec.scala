package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Constraints, StoreLog, Tables, TsStore}

/** Writable refs / branches + write-audit-publish (the Iceberg branch
  * pattern on the linear CAS log — StoreLog.MainRefProp and friends):
  * branch commits invisible to main, atomic fast-forward, time travel
  * across the merge, vacuum retention of both refs, the publish-time
  * constraint audit, divergence refusal, and the replacing-verb gate.
  */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables.events(spark, TestSpark.sf001)
  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value")

  private def freshStore(): (String, Long) = {
    val dir = Files.createTempDirectory("graft_branch").toString
    TsStore.write(events.select(cols.map(col): _*), dir,
      tsCol = "ts", uidCols = Seq("event_type"))
    (dir, TsStore.load(spark, dir).count())
  }

  private def row(id: Long, t: String, v: Double) =
    Seq((id, java.sql.Timestamp.valueOf(t), 1L, "view", v)).toDF(cols: _*)

  private def appendBranch(dir: String, df: org.apache.spark.sql.DataFrame,
                           b: String): Unit =
    TsStore.write(df, dir, tsCol = "ts", uidCols = Seq("event_type"),
      mode = SaveMode.Append, overlapPolicy = TsStore.OverlapPolicy.Allow,
      branch = Some(b))

  test("branch commits are invisible to main; publish fast-forwards atomically") {
    val (dir, n0) = freshStore()
    val base = TsStore.branch(dir, "audit")
    assert(TsStore.listBranches(dir) === Map("audit" -> base))
    appendBranch(dir, row(700001L, "2035-01-01 00:00:00", 1.0), "audit")
    appendBranch(dir, row(700002L, "2035-01-01 00:00:01", 2.0), "audit")
    // MAIN readers — Scala load, DSv2, countAt — all still see n0
    assert(TsStore.load(spark, dir).count() === n0)
    assert(spark.read.format("graft").load(dir).count() === n0)
    assert(TsStore.countAt(dir).contains(n0))
    // the branch HEAD reads both staged rows (Scala asOf via head version)
    val bv = StoreLog.branchVersion(dir, "audit").get
    assert(TsStore.load(spark, dir, asOf = Some(bv))
      .filter(col("event_id") >= 700001L).count() === 2L)
    // main appends keep working CONCURRENTLY with the open branch —
    // wait: a main append moves main and publish then refuses; this
    // case pins the clean fast-forward, so publish FIRST
    val pv = TsStore.publishBranch(spark, dir, "audit")
    assert(TsStore.listBranches(dir).isEmpty)
    // ONE version: main jumped to the branch view atomically
    assert(TsStore.load(spark, dir).count() === n0 + 2)
    assert(spark.read.format("graft").load(dir)
      .filter(col("event_id") >= 700001L).count() === 2L)
    // time travel ACROSS the merge: the pre-publish main era still reads
    assert(TsStore.load(spark, dir, asOf = Some(base)).count() === n0)
    // and the publish version reads the merged view
    assert(TsStore.load(spark, dir, asOf = Some(pv)).count() === n0 + 2)
  }

  test("main appends during a branch stay on main; divergence refuses publish") {
    val (dir, n0) = freshStore()
    TsStore.branch(dir, "wap")
    appendBranch(dir, row(710001L, "2035-02-01 00:00:00", 1.0), "wap")
    // a MAIN append while the branch is open: lands on main only
    TsStore.write(row(710002L, "2035-02-01 00:00:01", 2.0), dir,
      tsCol = "ts", uidCols = Seq("event_type"), mode = SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 710002L).count() === 1L)
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 710001L).count() === 0L)
    val bv = StoreLog.branchVersion(dir, "wap").get
    val branchView = TsStore.load(spark, dir, asOf = Some(bv))
    assert(branchView.filter(col("event_id") === 710001L).count() === 1L)
    assert(branchView.filter(col("event_id") === 710002L).count() === 0L)
    // main moved since branch creation → publish refuses (diverged)
    val e = intercept[Exception](TsStore.publishBranch(spark, dir, "wap"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // drop abandons; main is untouched and fully writable again
    TsStore.dropBranch(dir, "wap")
    assert(TsStore.listBranches(dir).isEmpty)
    assert(TsStore.load(spark, dir).count() === n0 + 1)
    TsStore.upsert(spark, dir,
      row(710003L, "2035-02-01 00:00:02", 3.0).withColumn("version", lit(2L)),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 710003L).count() === 1L)
  }

  test("replacing verbs refuse while a branch is open") {
    val (dir, _) = freshStore()
    TsStore.branch(dir, "gate")
    val e = intercept[Exception](TsStore.upsert(spark, dir,
      row(720001L, "2035-03-01 00:00:00", 1.0).withColumn("version", lit(2L)),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type")))
    assert(e.getMessage.contains("active branch"), e.getMessage)
    val e2 = intercept[Exception](
      TsStore.delete(spark, dir, col("event_id") % 5 === 0, "ts",
        Seq("event_type")))
    assert(e2.getMessage.contains("active branch"), e2.getMessage)
    // Overwrite would destroy the branch log wholesale — refuses too
    val e3 = intercept[Exception](TsStore.write(
      row(720002L, "2035-03-01 00:00:01", 1.0), dir,
      tsCol = "ts", uidCols = Seq("event_type")))
    assert(e3.getMessage.contains("branch"), e3.getMessage)
    TsStore.dropBranch(dir, "gate")
    // reopened: the same upsert goes through
    TsStore.upsert(spark, dir,
      row(720001L, "2035-03-01 00:00:00", 1.0).withColumn("version", lit(2L)),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"))
  }

  test("publish AUDITS the branch against CURRENT constraints (the WAP contract)") {
    val (dir, _) = freshStore()
    // make the fixture satisfy the constraint we'll add mid-branch
    TsStore.delete(spark, dir, col("value") < 0, "ts", Seq("event_type"))
    TsStore.branch(dir, "q")
    appendBranch(dir, row(730001L, "2035-04-01 00:00:00", -9.0), "q")
    // the constraint lands AFTER the branch's write (metadata commits
    // are ref-neutral and legal under an open branch); committed MAIN
    // rows satisfy it, so the ADD certifies
    Constraints.validateAdd(spark, dir,
      events.select(cols.map(col): _*).schema,
      Constraints.Check("vpos", "value >= 0"))
    val cur = StoreLog.latest(dir).get
    StoreLog.commit(dir, cur.version, Seq.empty, cur.files,
      parent = Some(cur), setProps = Map("constraint.vpos" -> "value >= 0"))
    // the branch's -9 row would break main's invariant — publish refuses
    val e = intercept[Exception](TsStore.publishBranch(spark, dir, "q"))
    assert(e.getMessage.contains("audit failed") &&
      e.getMessage.contains("vpos"), e.getMessage)
    assert(TsStore.listBranches(dir).keySet === Set("q"), "refusal keeps the branch")
    TsStore.dropBranch(dir, "q")
    assert(TsStore.load(spark, dir).filter(col("value") < 0).count() === 0L)
  }

  test("vacuum retains both refs' pinned versions like tags") {
    val (dir, n0) = freshStore()
    TsStore.branch(dir, "keep")
    appendBranch(dir, row(740001L, "2035-05-01 00:00:00", 1.0), "keep")
    // churn the chain with tags (metadata commits) so the count window
    // alone would drop the ref-pinned versions
    (1 to 8).foreach(k => { TsStore.tag(dir, s"c$k"); TsStore.dropTag(dir, s"c$k") })
    val mv = StoreLog.mainVersion(dir).get
    val bv = StoreLog.branchVersion(dir, "keep").get
    StoreLog.vacuum(dir, retainVersions = 1)
    val kept = StoreLog.listVersions(dir)
    assert(kept.contains(mv), s"main ref v$mv must survive vacuum (kept $kept)")
    assert(kept.contains(bv), s"branch head v$bv must survive vacuum (kept $kept)")
    // both views still read fully
    assert(TsStore.load(spark, dir).count() === n0)
    assert(TsStore.load(spark, dir, asOf = Some(bv)).count() === n0 + 1)
    // publish still works after the vacuum; the published view reads
    TsStore.publishBranch(spark, dir, "keep")
    assert(TsStore.load(spark, dir).count() === n0 + 1)
  }

  test("SQL face: CALL branch/branches/publish_branch, VERSION AS OF a branch name") {
    val dir = Files.createTempDirectory("graft_branch_sql").toString
    val cat = "gbr"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (event_id BIGINT, ts TIMESTAMP, " +
      "user_id BIGINT, event_type STRING, value DOUBLE) USING graft " +
      "PARTITIONED BY (event_type)")
    events.select(cols.map(col): _*).limit(300)
      .createOrReplaceTempView("br_src")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM br_src")
    val n0 = spark.sql(s"SELECT count(*) FROM $cat.ns.t").head().getLong(0)
    spark.sql(s"CALL $cat.system.branch('ns.t', 'stage')")
    assert(spark.sql(s"CALL $cat.system.branches('ns.t')").collect()
      .map(_.getString(0)).toSeq === Seq("stage"))
    val path = s"$dir/ns/t"
    appendBranch(path, row(750001L, "2035-06-01 00:00:00", 5.0), "stage")
    // main SQL reads see nothing; VERSION AS OF the branch name does
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head().getLong(0) === n0)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t VERSION AS OF 'stage' " +
      "WHERE event_id = 750001").head().getLong(0) === 1L)
    // SQL INSERT while the branch is open targets MAIN (ref-aware append)
    spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
      "(750002, TIMESTAMP'2035-06-01 00:00:01', 1, 'view', 6.0)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t WHERE event_id = 750002")
      .head().getLong(0) === 1L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t VERSION AS OF 'stage' " +
      "WHERE event_id = 750002").head().getLong(0) === 0L)
    // main moved → publish refuses; drop, re-branch, publish clean
    assert(intercept[Exception](spark.sql(
      s"CALL $cat.system.publish_branch('ns.t', 'stage')"))
      .getMessage.contains("diverged"))
    spark.sql(s"CALL $cat.system.drop_branch('ns.t', 'stage')")
    spark.sql(s"CALL $cat.system.branch('ns.t', 'stage2')")
    appendBranch(path, row(750003L, "2035-06-01 00:00:02", 7.0), "stage2")
    spark.sql(s"CALL $cat.system.publish_branch('ns.t', 'stage2')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t WHERE event_id = 750003")
      .head().getLong(0) === 1L)
    assert(spark.sql(s"CALL $cat.system.branches('ns.t')").collect().isEmpty)
  }

  test("TIMESTAMP AS OF and the graft_store TVF never leak an open branch's rows") {
    val dir = Files.createTempDirectory("graft_branch_tsof").toString
    val cat = "gbts"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (event_id BIGINT, ts TIMESTAMP, " +
      "user_id BIGINT, event_type STRING, value DOUBLE) USING graft " +
      "PARTITIONED BY (event_type)")
    events.select(cols.map(col): _*).limit(200)
      .createOrReplaceTempView("bts_src")
    spark.sql(s"INSERT INTO $cat.ns.t SELECT * FROM bts_src")
    val n0 = spark.sql(s"SELECT count(*) FROM $cat.ns.t").head().getLong(0)
    val path = s"$dir/ns/t"
    TsStore.branch(path, "tleak")
    appendBranch(path, row(790001L, "2035-10-01 00:00:00", 1.0), "tleak")
    // "the table as of NOW" = the MAIN view, even though the newest
    // commit at-or-before now is the branch append
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.t TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) === n0)
    // the TVF's live pin resolves through the main ref too
    assert(spark.sql(s"SELECT count(*) FROM graft_store('$path')")
      .head().getLong(0) === n0)
    TsStore.publishBranch(spark, path, "tleak")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.t TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) === n0 + 1)
  }

  test("interleaved main/branch appends keep every file's stats and sizes (ref carriage)") {
    val (dir, _) = freshStore()
    TsStore.branch(dir, "mix")
    // zig-zag: each append's delta re-adds the OTHER ref's exclusive
    // files — without the carriage their stats/sizes would silently
    // strip (stat-less files stay correct but unprunable forever)
    appendBranch(dir, row(780001L, "2035-09-01 00:00:00", 1.0), "mix")
    TsStore.write(row(780002L, "2035-09-01 00:00:01", 2.0), dir,
      tsCol = "ts", uidCols = Seq("event_type"),
      mode = org.apache.spark.sql.SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    appendBranch(dir, row(780003L, "2035-09-01 00:00:02", 3.0), "mix")
    TsStore.write(row(780004L, "2035-09-01 00:00:03", 4.0), dir,
      tsCol = "ts", uidCols = Seq("event_type"),
      mode = org.apache.spark.sql.SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    val mv = StoreLog.mainVersion(dir).get
    val bv = StoreLog.branchVersion(dir, "mix").get
    Seq(mv, bv).foreach { v =>
      val s = StoreLog.read(dir, v)
      val missing = s.files.filterNot(f =>
        s.stats.contains(f) && s.sizes.contains(f))
      assert(missing.isEmpty,
        s"v$v lost stats/sizes for: ${missing.mkString(", ")}")
    }
    // both views still read their own rows only
    assert(TsStore.load(spark, dir, asOf = Some(bv))
      .filter(col("event_id").isin(780001L, 780003L)).count() === 2L)
    assert(TsStore.load(spark, dir)
      .filter(col("event_id").isin(780002L, 780004L)).count() === 2L)
    assert(TsStore.load(spark, dir)
      .filter(col("event_id").isin(780001L, 780003L)).count() === 0L)
  }

  test("the streaming sink lands epochs on a branch (WAP streaming ingest)") {
    val (dir, n0) = freshStore()
    TsStore.branch(dir, "feed")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val ckpt = Files.createTempDirectory("graft_branch_sink").toString
    val q = mem.toDF().toDF(cols: _*).writeStream.format("graft-store")
      .option("path", dir).option("tsCol", "ts")
      .option("uids", "event_type").option("feedId", "wapfeed")
      .option("branch", "feed")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((770001L, java.sql.Timestamp.valueOf("2035-08-01 00:00:00"),
        1L, "view", 1.0))
      q.processAllAvailable()
      mem.addData((770002L, java.sql.Timestamp.valueOf("2035-08-01 00:00:01"),
        1L, "view", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    // both epochs invisible to main, readable on the branch
    assert(TsStore.load(spark, dir).count() === n0)
    val bv = StoreLog.branchVersion(dir, "feed").get
    assert(TsStore.load(spark, dir, asOf = Some(bv))
      .filter(col("event_id") >= 770001L).count() === 2L)
    TsStore.publishBranch(spark, dir, "feed")
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") >= 770001L).count() === 2L)
  }

  test("property: randomized main/branch/tag interleavings keep both views exact") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 3).foreach { trial =>
      val (dir, _) = freshStore()
      val baseIds = TsStore.load(spark, dir).select("event_id")
        .collect().map(_.getLong(0)).toSet
      var mainIds = baseIds
      var branchSt: Option[(String, Set[Long], Set[Long])] = None // (name, view, mainAtCreate)
      var nextId = 800000L + trial * 10000L
      var tagSeq = 0
      def freshRow(): (Long, org.apache.spark.sql.DataFrame) = {
        nextId += 1
        (nextId, row(nextId, f"2036-01-01 00:${(nextId % 60)}%02d:00", 1.0))
      }
      (1 to 10).foreach { _ =>
        rnd.nextInt(7) match {
          case 0 => // main append
            val (id, df) = freshRow()
            TsStore.write(df, dir, tsCol = "ts", uidCols = Seq("event_type"),
              mode = org.apache.spark.sql.SaveMode.Append,
              overlapPolicy = TsStore.OverlapPolicy.Allow)
            mainIds += id
          case 1 => // open a branch (or append to it if one is open)
            branchSt match {
              case None =>
                TsStore.branch(dir, s"p$trial")
                branchSt = Some((s"p$trial", mainIds, mainIds))
              case Some((b, view, base)) =>
                val (id, df) = freshRow()
                appendBranch(dir, df, b)
                branchSt = Some((b, view + id, base))
            }
          case 2 => // branch append when open, else main
            branchSt match {
              case Some((b, view, base)) =>
                val (id, df) = freshRow()
                appendBranch(dir, df, b)
                branchSt = Some((b, view + id, base))
              case None =>
                val (id, df) = freshRow()
                TsStore.write(df, dir, tsCol = "ts",
                  uidCols = Seq("event_type"),
                  mode = org.apache.spark.sql.SaveMode.Append,
                  overlapPolicy = TsStore.OverlapPolicy.Allow)
                mainIds += id
            }
          case 3 => // publish (must refuse iff main moved) else drop
            branchSt.foreach { case (b, view, base) =>
              if (mainIds == base) {
                TsStore.publishBranch(spark, dir, b)
                mainIds = view
              } else {
                assert(intercept[Exception](
                  TsStore.publishBranch(spark, dir, b))
                  .getMessage.contains("diverged"),
                  s"trial $trial: publish over moved main must refuse")
                TsStore.dropBranch(dir, b)
              }
              branchSt = None
            }
          case 4 => // tag noise (metadata commits are ref-neutral)
            tagSeq += 1
            TsStore.tag(dir, s"n$trial-$tagSeq")
          case 5 => // MAINTENANCE: compact the append partition. Every
            // row lands in event_type=view, so under an open branch the
            // oracle is sharp: main moved since creation ⟺ main holds
            // view files the branch lacks ⟺ PARTIAL overlap refuses;
            // otherwise the rewrite proceeds (full overlap, pin rebase)
            // and must PRESERVE publishability — the base advances only
            // because it was non-diverged (the laundering guard's
            // positive side). Branchless compaction always proceeds.
            branchSt match {
              case Some((_, _, base)) if mainIds != base =>
                val e = intercept[StoreLog.CommitConflict](
                  TsStore.compactPartitions(spark, dir,
                    Seq("event_type=view"), tsCol = "ts",
                    uidCols = Seq("event_type")))
                assert(e.getMessage.contains("overlaps"),
                  s"trial $trial: diverged-main compaction must refuse " +
                    s"on partial overlap, got: ${e.getMessage}")
              case _ =>
                TsStore.compactPartitions(spark, dir,
                  Seq("event_type=view"), tsCol = "ts",
                  uidCols = Seq("event_type"))
            }
          case 6 => // main dv takedown of one live row (branchless only:
            // main-targeted vectors refuse under an open branch) — the
            // vector must hold across every later op, incl. branch
            // inheritance and dv-materializing compaction
            if (branchSt.isEmpty && mainIds.nonEmpty) {
              val victim = mainIds.head
              TsStore.deleteVectors(spark, dir, col("event_id") === victim)
              mainIds -= victim
            }
        }
        // invariants after EVERY op: both views exact, stats complete
        def ids(asOf: Option[Long]): Set[Long] =
          TsStore.load(spark, dir, asOf = asOf).select("event_id")
            .collect().map(_.getLong(0)).toSet
        assert(ids(None) === mainIds, s"trial $trial: main view diverged")
        branchSt.foreach { case (b, view, _) =>
          val bv = StoreLog.branchVersion(dir, b).get
          assert(ids(Some(bv)) === view, s"trial $trial: branch view diverged")
        }
        val mv = StoreLog.mainVersion(dir).get
        val s = StoreLog.read(dir, mv)
        assert(s.files.forall(f => s.stats.contains(f) && s.sizes.contains(f)),
          s"trial $trial: main head lost stats")
      }
    }
  }

  test("the change feed never leaks branch commits; publish delivers them once") {
    val (dir, _) = freshStore()
    val sinkDir = Files.createTempDirectory("graft_branch_follow").toString
    val ckpt = Files.createTempDirectory("graft_branch_ckpt").toString
    def drain(): Set[Long] = {
      val q = spark.readStream.format("graft-store-changes").load(dir)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
      spark.read.parquet(sinkDir).select("event_id")
        .collect().map(_.getLong(0)).toSet
    }
    val seen0 = drain() // baseline
    TsStore.branch(dir, "feed")
    appendBranch(dir, row(760001L, "2035-07-01 00:00:00", 1.0), "feed")
    appendBranch(dir, row(760002L, "2035-07-01 00:00:01", 2.0), "feed")
    val seen1 = drain()
    assert(!seen1.contains(760001L) && !seen1.contains(760002L),
      "staged branch rows must NOT stream to followers before publish")
    TsStore.publishBranch(spark, dir, "feed")
    val seen2 = drain()
    assert(seen2.contains(760001L) && seen2.contains(760002L),
      "publish must deliver the branch's rows to the feed exactly once")
    assert(seen0.subsetOf(seen2))
  }

  test("branch-targeted UPSERT: a CDC batch lands on the branch, publish applies it") {
    val (dir, n0) = freshStore()
    TsStore.branch(dir, "cdc")
    // one update (existing key in 'view') + one insert, as a keyed batch
    val existing = TsStore.load(spark, dir)
      .filter(col("event_type") === "view").limit(1).collect().head
    val delta = Seq(
      (existing.getAs[Long]("event_id"), existing.getAs[java.sql.Timestamp]("ts"),
        existing.getAs[Long]("user_id"), "view", 9999.0, 2L),
      (770001L, java.sql.Timestamp.valueOf("2035-03-01 00:00:00"),
        1L, "view", 1.0, 2L)
    ).toDF(cols :+ "version": _*)
    TsStore.upsert(spark, dir,
      delta, keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"), branch = Some("cdc"))
    // MAIN: untouched (count, the updated row's OLD value, no insert)
    assert(TsStore.load(spark, dir).count() === n0)
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === existing.getAs[Long]("event_id"))
      .select("value").as[Double].head() === existing.getAs[Double]("value"))
    // BRANCH: merged view (the audit face)
    val bv = StoreLog.branchVersion(dir, "cdc").get
    val bView = TsStore.load(spark, dir, asOf = Some(bv))
    assert(bView.count() === n0 + 1)
    assert(bView.filter(col("event_id") === existing.getAs[Long]("event_id"))
      .select("value").as[Double].head() === 9999.0)
    // publish applies the batch to main atomically
    TsStore.publishBranch(spark, dir, "cdc")
    val main = TsStore.load(spark, dir)
    assert(main.count() === n0 + 1)
    assert(main.filter(col("event_id") === existing.getAs[Long]("event_id"))
      .select("value").as[Double].head() === 9999.0)
    assert(main.filter(col("event_id") === 770001L).count() === 1L)
  }

  test("branch-targeted dv DELETE: vectors invisible to main, die on drop, land on publish") {
    val (dir, n0) = freshStore()
    // --- publish path
    TsStore.branch(dir, "gdpr")
    val del = TsStore.load(spark, dir).filter(col("event_id") % 53 === 0).count()
    assert(del > 0)
    TsStore.deleteVectors(spark, dir, col("event_id") % 53 === 0,
      branch = Some("gdpr"))
    assert(TsStore.load(spark, dir).count() === n0,
      "a branch takedown must be invisible to main")
    val bv = StoreLog.branchVersion(dir, "gdpr").get
    assert(TsStore.load(spark, dir, asOf = Some(bv)).count() === n0 - del)
    // a MAIN append while the branch holds vectors must NOT leak them
    // into the main view (the refAppendBase dv reset)
    TsStore.write(row(780002L, "2035-04-01 00:00:00", 1.0), dir,
      tsCol = "ts", uidCols = Seq("event_type"), mode = SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    assert(TsStore.load(spark, dir).count() === n0 + 1,
      "a main append after a branch takedown must not inherit its vectors")
    // divergence: main moved → publish refuses; re-branch and redo
    intercept[IllegalArgumentException] {
      TsStore.publishBranch(spark, dir, "gdpr")
    }
    TsStore.dropBranch(dir, "gdpr")
    // the abandoned branch's vectors died with it
    assert(TsStore.load(spark, dir).count() === n0 + 1)
    assert(StoreLog.latest(dir).get.dvs.isEmpty,
      "dropping the branch must shed its vectors from the restored view")
    TsStore.branch(dir, "gdpr2")
    TsStore.deleteVectors(spark, dir, col("event_id") % 53 === 0,
      branch = Some("gdpr2"))
    val pv = TsStore.publishBranch(spark, dir, "gdpr2")
    assert(TsStore.load(spark, dir).count() === n0 + 1 - del)
    assert(TsStore.load(spark, dir, asOf = Some(pv)).count() === n0 + 1 - del)
    // publish carried the vectors into main's manifest state
    assert(StoreLog.latest(dir).get.dvs.nonEmpty)
  }

  test("branch-targeted cow DELETE: rewrite invisible to main, survivors exact on publish") {
    val (dir, n0) = freshStore()
    TsStore.branch(dir, "purge")
    val del = TsStore.load(spark, dir).filter(col("event_id") % 11 === 0).count()
    assert(del > 0)
    TsStore.delete(spark, dir, col("event_id") % 11 === 0, "ts",
      Seq("event_type"), branch = Some("purge"))
    // main untouched — no rewrite visible, no rows gone
    assert(TsStore.load(spark, dir).count() === n0)
    val bv = StoreLog.branchVersion(dir, "purge").get
    assert(TsStore.load(spark, dir, asOf = Some(bv)).count() === n0 - del)
    // unaffected files under the touched prefixes survive the branch
    // commit (exact-file remove, not prefix-wipe): every partition
    // still reads its non-matching rows on the branch
    assert(TsStore.load(spark, dir, asOf = Some(bv))
      .groupBy("event_type").count().collect().length === 5)
    TsStore.publishBranch(spark, dir, "purge")
    assert(TsStore.load(spark, dir).count() === n0 - del)
    assert(TsStore.load(spark, dir).filter(col("event_id") % 11 === 0).count() === 0L)
  }

  test("branch DML aborts when the branch moved or vanished mid-operation") {
    val (dir, _) = freshStore()
    TsStore.branch(dir, "race")
    // stage an upsert whose branch is dropped before its commit: the
    // commit loop must abort (CommitConflict), never land on main
    val delta = row(790001L, "2035-05-01 00:00:00", 1.0)
      .withColumn("version", lit(2L))
    // simulate the mid-flight drop by dropping BEFORE the verb runs its
    // commit — the verb reads the pin at entry, so drop right after
    // requires racing; instead pin the abort contract at entry level:
    TsStore.dropBranch(dir, "race")
    intercept[IllegalArgumentException] {
      TsStore.upsert(spark, dir, delta, keyCols = Seq("event_id"),
        versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"),
        branch = Some("race"))
    }
    // and a branch takedown against a published branch refuses the same way
    intercept[IllegalArgumentException] {
      TsStore.deleteVectors(spark, dir, col("event_id") === 1L,
        branch = Some("race"))
    }
  }

  test("branch age-expiry: forgotten branches die at vacuum, active ones never do") {
    val (dir, n0) = freshStore()
    val t0 = System.currentTimeMillis()
    TsStore.branch(dir, "forgotten", expireMs = Some(10000L))
    // the forgotten branch holds real work: a rewrite AND a vector —
    // expiry must shed both like dropBranch
    appendBranch(dir, row(830001L, "2035-07-01 00:00:00", 7.0), "forgotten")
    TsStore.deleteVectors(spark, dir, col("event_id") === 1L,
      branch = Some("forgotten"))
    TsStore.branch(dir, "forever") // no declared expiry — immortal
    // before its idle age passes: nothing expires
    assert(TsStore.expireBranches(dir, t0 + 5000L).isEmpty)
    // touch advances with branch activity: append again near the
    // deadline, then check just past the ORIGINAL deadline — alive
    appendBranch(dir, row(830002L, "2035-07-01 00:00:01", 7.0), "forgotten")
    val touched = System.currentTimeMillis()
    assert(TsStore.expireBranches(dir, touched + 9000L).isEmpty,
      "an active branch must not expire from its creation stamp")
    // idle past the expiry: dies like dropBranch — rows and vectors shed
    assert(TsStore.expireBranches(dir, touched + 60000L) === Seq("forgotten"))
    assert(StoreLog.branches(dir).keySet === Set("forever"))
    // vectors die from every VIEW (the tip snapshot may keep zig-zag
    // residue while other branches remain — reads resolve refs)
    assert(StoreLog.read(dir, StoreLog.mainVersion(dir).get).dvs.isEmpty,
      "the expired branch's vectors must die with it")
    assert(TsStore.load(spark, dir).count() === n0)
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") >= 830001L).limit(1).count() === 0L)
    // expiry props cleaned: a fresh same-name branch starts a new life
    val props = StoreLog.propsAt(dir, StoreLog.latestVersion(dir).get)
    assert(!props.contains(StoreLog.BranchExpirePrefix + "forgotten"))
    assert(!props.contains(StoreLog.BranchTouchPrefix + "forgotten"))
    // vacuum runs expiry automatically (an already-expired branch at
    // vacuum time is gone before retention is computed)
    TsStore.branch(dir, "gone", expireMs = Some(0L))
    Thread.sleep(5)
    TsStore.vacuum(dir, retainVersions = 100)
    assert(StoreLog.branches(dir).keySet === Set("forever"))
  }

  private def fragStore(): String = {
    val dir = Files.createTempDirectory("graft_branch_maint").toString
    TsStore.write(events.select(cols.map(col): _*), dir,
      tsCol = "ts", uidCols = Seq("event_type"), maxRecordsPerFile = 100)
    dir
  }
  private def filesUnder(dir: String, p: String): Seq[String] =
    StoreLog.latest(dir).map { cur =>
      val mv = cur.props.get(StoreLog.MainRefProp).flatMap(_.toLongOption)
        .getOrElse(cur.version)
      StoreLog.read(dir, mv).files.filter(_.startsWith(p + "/"))
    }.getOrElse(Nil)

  test("maintenance under an open branch: compact proceeds, branch rebases, publish works") {
    val dir = fragStore()
    TsStore.branch(dir, "wap")
    // the branch's own work: a CDC append into event_type=view
    appendBranch(dir, row(810001L, "2035-06-01 00:00:00", 7.0), "wap")
    val bv0 = StoreLog.branchVersion(dir, "wap").get
    val branchBefore = TsStore.load(spark, dir, asOf = Some(bv0))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(filesUnder(dir, "event_type=click").size > 1,
      "fixture must be fragmented")
    // nightly compaction of a partition the branch holds IN FULL (it
    // only appended elsewhere) — the old blanket guard refused here
    val vC = TsStore.compactPartitions(spark, dir,
      Seq("event_type=click"), tsCol = "ts", uidCols = Seq("event_type"))
    assert(vC > bv0, "compaction must commit under the open branch")
    assert(filesUnder(dir, "event_type=click").size === 1,
      "main's partition must be compacted")
    // the branch pin REBASED through the same mapping: content
    // byte-equal, layout propagated
    val bv1 = StoreLog.branchVersion(dir, "wap").get
    assert(bv1 > bv0, "the branch pin must rebase")
    val branchAfter = TsStore.load(spark, dir, asOf = Some(bv1))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(branchAfter === branchBefore,
      "the branch view must be byte-equal across the rewrite")
    assert(StoreLog.read(dir, bv1).files
      .count(_.startsWith("event_type=click/")) === 1,
      "the rebased branch view must carry the compacted layout")
    // main never saw the branch row
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 810001L).limit(1).count() === 0L)
    // and publish still fast-forwards (base advanced with the rewrite)
    TsStore.publishBranch(spark, dir, "wap")
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 810001L).count() === 1L)
    assert(filesUnder(dir, "event_type=click").size === 1)
  }

  test("race: concurrent branch appends and maintenance serialize to the exact views") {
    // branch APPENDS re-resolve the pin per CAS attempt (they never
    // abort on a pin move, unlike branch DML), and the maintenance
    // commit re-proves overlap per attempt then best-effort-rebases
    // the pin — so a live interleaving must serialize: every append
    // lands, the rewrite lands, both views stay exact, and publish
    // still fast-forwards (main never moved, so the base advanced).
    (1 to 3).foreach { trial =>
      val dir = fragStore()
      TsStore.branch(dir, "wap")
      val n0 = TsStore.load(spark, dir).count()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ids = (1 to 3).map(i => 840000L + trial * 100L + i)
      val tA = new Thread(() => {
        try ids.foreach { id =>
          appendBranch(dir,
            row(id, f"2035-07-0$trial 00:0${(id % 6).toInt}:00", 1.0), "wap")
        } catch { case t: Throwable => errs.add(t); () }
      })
      val tB = new Thread(() => {
        try {
          TsStore.compactPartitions(spark, dir, Seq("event_type=view"),
            tsCol = "ts", uidCols = Seq("event_type"))
          TsStore.compactPartitions(spark, dir, Seq("event_type=click"),
            tsCol = "ts", uidCols = Seq("event_type"))
        } catch { case t: Throwable => errs.add(t); () }
      })
      tA.start(); tB.start()
      tA.join(180000L); tB.join(180000L)
      assert(errs.isEmpty, s"trial $trial unexpected: " +
        errs.toArray.map { case t: Throwable => t.getMessage }.mkString("; "))
      // main never saw the branch rows; branch view holds all of them
      assert(TsStore.load(spark, dir).count() === n0, s"trial $trial")
      val bv = StoreLog.branchVersion(dir, "wap").get
      assert(TsStore.load(spark, dir, asOf = Some(bv))
        .filter(col("event_id") >= 840000L).count() === ids.size.toLong,
        s"trial $trial: every racing append must land on the branch")
      // base advanced with the rewrite (main never moved) → publish works
      TsStore.publishBranch(spark, dir, "wap")
      assert(TsStore.load(spark, dir).count() === n0 + ids.size,
        s"trial $trial: publish must deliver the full batch")
    }
  }

  test("maintenance never launders main-branch divergence: publish keeps refusing") {
    // main moves AFTER the branch was created (append to a partition
    // the compaction does not touch) — publish must refuse with or
    // without an intervening rewrite. The rewrite itself is still
    // semantics-preserving and proceeds, but it must NOT advance the
    // diverged branch's base: doing so would launder the divergence
    // and let a later publish fast-forward a branch view that never
    // saw main's post-branch append, silently dropping that row.
    val dir = fragStore()
    TsStore.branch(dir, "wap")
    appendBranch(dir, row(830001L, "2035-06-03 00:00:00", 7.0), "wap")
    TsStore.write(row(830002L, "2035-06-03 00:00:01", 8.0), dir,
      tsCol = "ts", uidCols = Seq("event_type"), mode = SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow) // MAIN append: diverges
    assert(filesUnder(dir, "event_type=click").size > 1)
    TsStore.compactPartitions(spark, dir, Seq("event_type=click"),
      tsCol = "ts", uidCols = Seq("event_type"))
    assert(filesUnder(dir, "event_type=click").size === 1,
      "the semantics-preserving rewrite still proceeds under divergence")
    val e = intercept[Exception](TsStore.publishBranch(spark, dir, "wap"))
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // main's post-branch append is alive, branch still droppable
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 830002L).count() === 1L)
    TsStore.dropBranch(dir, "wap")
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 830002L).count() === 1L)
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 830001L).count() === 0L)
  }

  test("maintenance under an open branch: zorder proceeds and the branch stays exact") {
    val dir = fragStore()
    TsStore.branch(dir, "wap")
    appendBranch(dir, row(820001L, "2035-06-02 00:00:00", 7.0), "wap")
    val bv0 = StoreLog.branchVersion(dir, "wap").get
    val branchBefore = TsStore.load(spark, dir, asOf = Some(bv0))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    TsStore.zorder(spark, dir, clusterCols = Seq("user_id", "value"),
      uidCols = Seq("event_type"), scope = Seq("event_type=click"))
    val bv1 = StoreLog.branchVersion(dir, "wap").get
    val branchAfter = TsStore.load(spark, dir, asOf = Some(bv1))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(branchAfter === branchBefore)
    TsStore.publishBranch(spark, dir, "wap")
    assert(TsStore.load(spark, dir)
      .filter(col("event_id") === 820001L).count() === 1L)
  }

  test("maintenance under an open branch: genuine overlap and dv divergence refuse") {
    // PARTIAL overlap: a branch cow-delete rewrote SOME of the
    // partition's files — substitution would corrupt the branch
    val dir = fragStore()
    TsStore.branch(dir, "cow")
    val oneClick = events.filter(col("event_type") === "click")
      .select(col("event_id")).limit(1).collect().head.getLong(0)
    TsStore.delete(spark, dir, col("event_id") === oneClick, "ts",
      Seq("event_type"), branch = Some("cow"))
    val e = intercept[StoreLog.CommitConflict](
      TsStore.compactPartitions(spark, dir, Seq("event_type=click"),
        tsCol = "ts", uidCols = Seq("event_type")))
    assert(e.getMessage.contains("overlaps"), e.getMessage)
    TsStore.dropBranch(dir, "cow")
    // DV divergence: a branch takedown vectored a shared file — the
    // rewrite would materialize MAIN's (empty) vector state
    val dir2 = fragStore()
    TsStore.branch(dir2, "dv")
    TsStore.deleteVectors(spark, dir2,
      col("event_id") === oneClick && col("event_type") === "click",
      branch = Some("dv"))
    val e2 = intercept[StoreLog.CommitConflict](
      TsStore.compactPartitions(spark, dir2, Seq("event_type=click"),
        tsCol = "ts", uidCols = Seq("event_type")))
    assert(e2.getMessage.contains("diverging deletion vectors"), e2.getMessage)
    // ZERO overlap: the branch replaced the whole partition itself —
    // main-side compaction is invisible to it and publish honors the
    // branch's files (the rewrite's output simply dies unreferenced)
    val dir3 = fragStore()
    TsStore.branch(dir3, "up")
    TsStore.upsert(spark, dir3,
      events.filter(col("event_type") === "view")
        .select(cols.map(col): _*)
        .withColumn("value", col("value") + 100.0)
        .withColumn("version", lit(2L)),
      keyCols = Seq("event_id"), versionCol = "version",
      tsCol = "ts", uidCols = Seq("event_type"), branch = Some("up"))
    val bv = StoreLog.branchVersion(dir3, "up").get
    TsStore.compactPartitions(spark, dir3, Seq("event_type=view"),
      tsCol = "ts", uidCols = Seq("event_type"))
    assert(StoreLog.branchVersion(dir3, "up").get === bv,
      "a zero-overlap branch must not be rebased")
    TsStore.publishBranch(spark, dir3, "up")
    val got = TsStore.load(spark, dir3)
      .filter(col("event_type") === "view").agg(min(col("value"))).collect()
    assert(got.head.getDouble(0) >= 100.0,
      "publish must deliver the branch's replaced partition")
  }
}
