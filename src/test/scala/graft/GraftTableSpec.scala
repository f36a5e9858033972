package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftScan, StoreLog, Tables, TsStore}

/** The DSv2 face of the store: `spark.read.format("graft")` (live +
  * asOf), the three-tier scan pruning (partition values, manifest
  * stats, parquet row groups), and the [[graft.sources.GraftCatalog]]
  * named-table surface (CREATE/INSERT/SELECT/time travel) from pure SQL.
  */
class GraftTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value")

  /** A logged store over the events fixture with an upsert on top, so
    * the directory holds DEAD files a correct reader must not see.
    */
  private def buildStore(maxRecords: Long = 8L << 20): (String, Long) = {
    val base = Tables.events(spark, TestSpark.sf001)
      .select(cols.map(col) :+ lit(1L).as("version"): _*)
    val dir = Files.createTempDirectory("graft_dsv2").toString
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"),
      maxRecordsPerFile = maxRecords)
    val delta = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase" && col("event_id") % 5 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") * 3.0).as("value"), lit(2L).as("version"))
    val v = TsStore.upsert(spark, dir, delta, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    (dir, v)
  }

  test("format(graft) reads the live view; asOf time-travels") {
    val (dir, v) = buildStore()
    val live = spark.read.format("graft").load(dir)
    val want = TsStore.load(spark, dir)
    assert(live.count() === want.count())
    assert(live.select(cols.map(col): _*).except(want.select(cols.map(col): _*)).count() === 0)
    // a plain parquet read would resurrect the dead pre-upsert files
    val naive = spark.read.parquet(dir).count()
    assert(naive > live.count(), s"fixture must hold dead files: naive=$naive live=${live.count()}")
    // asOf reconstructs the pre-upsert store
    val old = spark.read.format("graft").option("asOf", v - 1).load(dir)
    val wantOld = TsStore.load(spark, dir, asOf = Some(v - 1))
    assert(old.count() === wantOld.count())
    assert(old.filter(col("version") === 2L).count() === 0)
  }

  test("format(graft) on an UNLOGGED partitioned directory keeps its partition columns") {
    // no manifest anywhere: the provider must still read the directory
    // layout's partition columns as partition VALUES, not as absent
    // data columns surfacing null
    val dir = Files.createTempDirectory("graft_unlogged").toString + "/plain"
    Tables.events(spark, TestSpark.sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.partitionBy("event_type").parquet(dir)
    assert(StoreLog.latest(dir).isEmpty, "fixture must be unlogged")
    val got = spark.read.format("graft").load(dir)
    assert(got.filter(col("event_type").isNull).count() === 0,
      "partition values must come from the directory layout")
    val want = spark.read.parquet(dir)
    assert(got.count() === want.count())
    assert(got.select("event_id", "event_type").except(
      want.select("event_id", "event_type")).count() === 0)
  }

  test("pushed filters prune files at plan time (partition + stat tiers)") {
    val (dir, _) = buildStore(maxRecords = 50)
    val liveFiles = StoreLog.latest(dir).get.files.size
    assert(liveFiles >= 10, s"fixture too small: $liveFiles files")
    def scanOf(df: org.apache.spark.sql.DataFrame): GraftScan = {
      val scans = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan
      }
      assert(scans.size === 1, s"expected one BatchScanExec, got ${scans.size}")
      scans.head.asInstanceOf[GraftScan]
    }
    // tier 1: a partition predicate drops whole uid directories
    val byUid = spark.read.format("graft").load(dir)
      .filter(col("event_type") === "purchase")
    val uidScan = scanOf(byUid)
    assert(uidScan.plannedFiles.size < liveFiles,
      s"partition prune must engage: ${uidScan.plannedFiles.size} of $liveFiles")
    assert(uidScan.plannedFiles.forall(_.startsWith("event_type=purchase/")))
    val wantUid = TsStore.load(spark, dir).filter(col("event_type") === "purchase")
    assert(byUid.count() === wantUid.count())
    // tier 2: a ts-slice prunes via the manifest's recorded bounds
    // (files are ts-clustered by the chunked write)
    val lo = java.sql.Timestamp.valueOf("2024-01-01 02:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-01 03:00:00")
    val slice = spark.read.format("graft").load(dir)
      .filter(col("ts") >= lo && col("ts") <= hi)
    val sliceScan = scanOf(slice)
    assert(sliceScan.plannedFiles.size * 2 <= liveFiles,
      s"stat prune must engage: ${sliceScan.plannedFiles.size} of $liveFiles")
    val wantSlice = TsStore.load(spark, dir).filter(col("ts") >= lo && col("ts") <= hi)
    assert(slice.count() === wantSlice.count())
    assert(slice.count() > 0)
    // column pruning narrows the reader's schema to EXACTLY the request
    // (requested order — a reordering scan would force a restoring
    // Project and break the DSv2 DELETE strategy)
    val proj = spark.read.format("graft").load(dir).select("event_id", "value")
    val projScan = scanOf(proj)
    assert(projScan.readSchema().fieldNames.toSeq === Seq("event_id", "value"))
    // an atomic-columns projection reads COLUMNAR (vectorized batches
    // into whole-stage codegen, like a native parquet scan) and agrees
    // with the row path's answer
    val projPlan = proj.queryExecution.executedPlan
    val colScan = projPlan.collect { case b: BatchScanExec => b }.head
    assert(colScan.supportsColumnar, "pruned atomic projection must scan columnar")
    val wantProj = TsStore.load(spark, dir).select("event_id", "value")
    assert(proj.except(wantProj).count() === 0 && wantProj.except(proj).count() === 0)
  }

  test("runtime filtering (DPP): a dimension-filtered join re-prunes store partitions") {
    import spark.implicits._
    val (dir, _) = buildStore(maxRecords = 50)
    val totalFiles = StoreLog.latest(dir).get.files.size
    // the dim must be a real SCAN with a selective filter (a folded
    // LocalRelation never triggers the planner's pruning-benefit check)
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("purchase", 1), ("refund", 0), ("view", 0), ("click", 0))
      .toDF("event_type", "flag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.format("graft").load(dir)
    val joined = fact.join(dim.filter(col("flag") === 1), "event_type")
    // execute THIS dataset's own plan (count() would build a separate
    // execution whose scan instance is not the one inspected below)
    val got = joined.collect().length.toLong
    val want = TsStore.load(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(got === want)
    // the scan object received the runtime IN-set and re-pruned: only
    // the purchase partition's files survive in plannedFiles. AQE wraps
    // executed stages in leaf QueryStageExec nodes — unwrap recursively.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"no BatchScanExec in:\n${joined.queryExecution.executedPlan}")
    val gscan = scans.map(_.scan).collectFirst { case g: GraftScan => g }.get
    assert(gscan.plannedFiles.nonEmpty &&
      gscan.plannedFiles.forall(_.startsWith("event_type=purchase/")),
      s"runtime filter must prune to the purchase partition: ${gscan.plannedFiles.take(3)}")
    assert(gscan.plannedFiles.size < totalFiles)
  }

  test("task layout: small files bin-pack; a low split cap splits files — rows exact either way") {
    val (dir, _) = buildStore(maxRecords = 50)
    val liveFiles = StoreLog.latest(dir).get.files.size
    assert(liveFiles >= 10)
    val want = TsStore.load(spark, dir).count()
    def partsOf(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputPartitions.size
      }.head
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      // BIN-PACK: with the open-cost padding out of the way (the
      // fixture's files are KB-sized; at real scale the default 4MB
      // padding is what bounds per-task open counts), Spark's own
      // getFilePartitions packs the files into far fewer tasks —
      // the 100k-post-prune-files-is-not-100k-tasks property
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val binned = partsOf(spark.read.format("graft").load(dir))
      assert(binned < liveFiles, s"small files must bin-pack: $binned of $liveFiles")
      assert(spark.read.format("graft").load(dir).count() === want)
      // SPLIT: a tiny cap splits files into multiple tasks (the
      // one-10GB-file-is-not-one-task property); the parquet reader's
      // row-group-midpoint assignment keeps rows exactly-once
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
      val df = spark.read.format("graft").load(dir)
      val split = partsOf(df)
      assert(split > liveFiles, s"files must split under a 1k cap: $split vs $liveFiles")
      assert(df.count() === want, "splits must cover every row exactly once")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }

  test("LIMIT pushdown plans only enough files to cover n (bare limit only)") {
    val (dir, _) = buildStore(maxRecords = 50)
    val liveFiles = StoreLog.latest(dir).get.files.size
    assert(liveFiles >= 10)
    def gscanOf(df: org.apache.spark.sql.DataFrame): GraftScan =
      df.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan }
        .collectFirst { case g: GraftScan => g }.get
    val df = spark.read.format("graft").load(dir).limit(7)
    assert(df.count() === 7)
    val planned = gscanOf(df).plannedFiles.size
    assert(planned < liveFiles,
      s"a bare LIMIT 7 must not plan all $liveFiles files: planned $planned")
    // with a filter the truncation is UNSOUND (filtered row counts are
    // unknowable from totals) — every partition-pruned candidate stays
    val filtered = spark.read.format("graft").load(dir)
      .filter(col("event_type") === "purchase").limit(5)
    assert(filtered.count() === 5)
    val fPlanned = gscanOf(filtered).plannedFiles
    val purchaseFiles = StoreLog.latest(dir).get.files
      .count(_.startsWith("event_type=purchase/"))
    assert(fPlanned.size === purchaseFiles,
      s"filtered limit must keep every candidate: ${fPlanned.size} vs $purchaseFiles")
  }

  test("TopN pushdown: ORDER BY ts LIMIT n plans only the time-boundary files") {
    import spark.implicits._
    val (dir, _) = buildStore(maxRecords = 50)
    val liveFiles = StoreLog.latest(dir).get.files.size
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(allScans)
    }
    // run the INSPECTED dataset itself (a derived .select would build a
    // fresh execution whose scan never runs), then unwrap the stages
    def run(df: org.apache.spark.sql.DataFrame): (Seq[java.sql.Timestamp], GraftScan) = {
      val ts = df.collect().map(_.getAs[java.sql.Timestamp]("ts")).toSeq
      val scan = allScans(df.queryExecution.executedPlan).map(_.scan)
        .collectFirst { case g: GraftScan => g }
        .getOrElse(fail(s"no GraftScan in:\n${df.queryExecution.executedPlan}"))
      (ts, scan)
    }
    // "the latest 5 ticks" — the reference's hottest question
    val (gotDesc, descScan) = run(spark.read.format("graft").load(dir)
      .orderBy(col("ts").desc).limit(5))
    val wantDesc = TsStore.load(spark, dir).orderBy(col("ts").desc).limit(5)
      .collect().map(_.getAs[java.sql.Timestamp]("ts")).toSeq
    assert(gotDesc === wantDesc)
    val descPlanned = descScan.plannedFiles.size
    assert(descPlanned < liveFiles,
      s"DESC top-5 must plan the tail files only: $descPlanned of $liveFiles")
    // and the earliest 5
    val (gotAsc, ascScan) = run(spark.read.format("graft").load(dir)
      .orderBy(col("ts")).limit(5))
    val wantAsc = TsStore.load(spark, dir).orderBy(col("ts")).limit(5)
      .collect().map(_.getAs[java.sql.Timestamp]("ts")).toSeq
    assert(gotAsc === wantAsc)
    assert(ascScan.plannedFiles.size < liveFiles)
    // NULLS FIRST (the ASC default) with nulls present must NOT prune:
    // a null row ranks before every value, and bounds know nothing of it
    val ndir = Files.createTempDirectory("graft_topn_null").toString
    val rows = (1 to 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"),
        if (i % 7 == 0) None else Some(i.toLong), "a", i * 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    TsStore.write(rows, ndir, tsCol = "ts", uidCols = Seq("event_type"),
      maxRecordsPerFile = 20)
    StoreLog.ensure(ndir)
    val byUser = spark.read.format("graft").load(ndir)
      .orderBy(col("user_id")).limit(3)
    // top-3 under NULLS FIRST are null rows — correctness over everything
    assert(byUser.collect().forall(_.isNullAt(byUser.schema.fieldIndex("user_id"))))
    val nFiles = StoreLog.latest(ndir).get.files.size
    val nScan = allScans(byUser.queryExecution.executedPlan).map(_.scan)
      .collectFirst { case g: GraftScan => g }
      .getOrElse(fail(s"no GraftScan in:\n${byUser.queryExecution.executedPlan}"))
    assert(nScan.plannedFiles.size === nFiles,
      "nulls-first top-n with recorded nulls must keep every file")
  }

  test("scan reports manifest-derived statistics (pruning-aware)") {
    val (dir, _) = buildStore(maxRecords = 100)
    val df = spark.read.format("graft").load(dir)
      .filter(col("event_type") === "purchase")
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.asInstanceOf[GraftScan]
    val st = scan.estimateStatistics()
    assert(st.numRows().isPresent, "manifest row counts must be known")
    assert(st.numRows().getAsLong === df.count())
    assert(st.sizeInBytes().getAsLong > 0)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from the manifest, zero file IO") {
    import graft.sources.GraftAggScan
    val (dir, v) = buildStore(maxRecords = 100)
    val fact = spark.read.format("graft").load(dir)
    fact.createOrReplaceTempView("agg_fact")
    val df = spark.sql(
      "SELECT count(*) AS n, count(user_id) AS nu, min(event_id) AS lo, " +
        "max(event_id) AS hi, min(event_type) AS t0, max(ts) AS tmax FROM agg_fact")
    // the plan is the one-row manifest scan — no parquet partitions
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.exists(_.isInstanceOf[GraftAggScan]),
      s"expected the manifest agg scan, got: ${df.queryExecution.executedPlan}")
    // values equal the computed answer
    val want = TsStore.load(spark, dir)
      .selectExpr("count(*)", "count(user_id)", "min(event_id)",
        "max(event_id)", "min(event_type)", "max(ts)").head()
    assert(df.head() === want)
    // a FILTERED aggregate refuses the pushdown and still answers right
    val filtered = spark.sql("SELECT count(*) AS n FROM agg_fact WHERE value > 100.0")
    val fScans = filtered.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan }
    assert(!fScans.exists(_.isInstanceOf[GraftAggScan]),
      "a filtered aggregate must not answer from whole-file stats")
    assert(filtered.head().getLong(0) ===
      TsStore.load(spark, dir).filter(col("value") > 100.0).count())
    // float MIN/MAX refuse on principle (NaN-excluded parquet bounds)
    val fm = spark.sql("SELECT min(value) AS v FROM agg_fact")
    assert(!fm.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan }
      .exists(_.isInstanceOf[GraftAggScan]))
    assert(fm.head().getDouble(0) ===
      TsStore.load(spark, dir).agg(min("value")).head().getDouble(0))
    // time travel composes: count at the pre-upsert version
    val old = spark.read.format("graft").option("asOf", v - 1).load(dir)
    old.createOrReplaceTempView("agg_fact_old")
    val oldCount = spark.sql("SELECT count(*) AS n FROM agg_fact_old")
    assert(oldCount.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan }
      .exists(_.isInstanceOf[GraftAggScan]))
    assert(oldCount.head().getLong(0) ===
      TsStore.load(spark, dir, asOf = Some(v - 1)).count())
  }

  test("scan planning is metadata-only: ZERO data-file status RPCs on a sizes-complete store") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.gcnt.impl", classOf[CountingLocalFileSystem].getName)
    conf.set("fs.AbstractFileSystem.gcnt.impl", classOf[CountingFs].getName)
    conf.set(graft.sources.CommitIo.ExtraCasSchemesKey, "mocknn,gcnt")
    val local = Files.createTempDirectory("graft_gcnt").toString
    val dir = s"gcnt://$local/store"
    val base = Tables.events(spark, TestSpark.sf001)
      .select(cols.map(col) :+ lit(1L).as("version"): _*)
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val snap = StoreLog.ensure(dir)
    // an upsert so the manifest has lived through a delta commit too
    val delta = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase" && col("event_id") % 5 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") * 3.0).as("value"), lit(2L).as("version"))
    TsStore.upsert(spark, dir, delta, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    val cur = StoreLog.latest(dir).get
    assert(cur.files.nonEmpty && cur.files.forall(cur.sizes.contains),
      "store must be sizes-complete for this pin")
    val schema = spark.read.format("graft").load(dir).schema
    // planning from here on must touch ZERO data files' statuses: split
    // math and sizeInBytes both come from the manifest's recorded sizes
    val scan = new GraftScan(spark, dir, None, schema, schema, Array.empty)
    val before = CountingLocalFileSystem.parquetStatusCalls.get()
    val parts = scan.planInputPartitions()
    val stats = scan.estimateStatistics()
    val bytes = stats.sizeInBytes().getAsLong
    val after = CountingLocalFileSystem.parquetStatusCalls.get()
    assert(after === before,
      s"planning must be metadata-only, saw ${after - before} status RPCs")
    assert(parts.nonEmpty)
    assert(bytes === cur.files.map(cur.sizes).sum)
    assert(stats.numRows().getAsLong === TsStore.countAt(dir).get)
    // the layout is REAL: reading those partitions yields the live rows
    val live = spark.read.format("graft").load(dir)
    assert(live.count() === TsStore.load(spark, dir).count())
  }

  test("aggregate pushdown REFUSES MIN/MAX on a timestamp partition column (no silent nulls)") {
    import graft.sources.GraftAggScan
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft_tspart").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, t("2024-01-01 00:00:00"), t("2024-01-01 00:00:00"), 1.0),
      (2L, t("2024-01-01 00:01:00"), t("2024-01-01 00:00:00"), 2.0),
      (3L, t("2024-01-02 00:00:00"), t("2024-01-02 00:00:00"), 3.0),
      (4L, t("2024-01-03 00:00:00"), t("2024-01-03 00:00:00"), 4.0))
      .toDF("id", "ts", "pt", "v")
    TsStore.write(rows, dir, tsCol = "ts", uidCols = Seq("pt"))
    StoreLog.ensure(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("tspart_v")
    def aggScan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan }
        .exists(_.isInstanceOf[GraftAggScan])
    // MIN/MAX on the timestamp partition column: partPseudoStats has no
    // encoding for it, so the pushdown must REFUSE (previously it
    // answered NULL) — and the normal computation must be right
    val mm = spark.sql("SELECT min(pt) AS lo, max(pt) AS hi, count(pt) AS c FROM tspart_v")
    assert(!aggScan(mm), "timestamp partition MIN/MAX must refuse the manifest answer")
    val got = mm.head()
    assert(got.getTimestamp(0) === t("2024-01-01 00:00:00"))
    assert(got.getTimestamp(1) === t("2024-01-03 00:00:00"))
    assert(got.getLong(2) === 4L)
    // COUNT(pt) alone IS servable — null-ness needs only the directory
    // segment, which any partition type answers
    val c = spark.sql("SELECT count(pt) AS c FROM tspart_v")
    assert(aggScan(c), "COUNT(partition col) stays manifest-served")
    assert(c.head().getLong(0) === 4L)
  }

  test("GraftCatalog: CREATE / INSERT / SELECT / time travel / DROP from SQL") {
    val root = Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.gtest", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.ns")
    spark.sql(
      """CREATE TABLE gtest.ns.ticks (
        |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |  event_type STRING, value DOUBLE)
        |USING graft PARTITIONED BY (event_type)""".stripMargin)
    assert(spark.sql("SHOW TABLES IN gtest.ns").collect().map(_.getString(1)).contains("ticks"))
    // empty table: readable, zero rows, declared schema
    assert(spark.sql("SELECT * FROM gtest.ns.ticks").count() === 0)
    // first INSERT: v2 commit through the ordinary logged append path
    val ev = Tables.events(spark, TestSpark.sf001).select(cols.map(col): _*)
    ev.createOrReplaceTempView("ev_src")
    spark.sql("INSERT INTO gtest.ns.ticks SELECT event_id, ts, user_id, event_type, value FROM ev_src")
    val got = spark.sql("SELECT * FROM gtest.ns.ticks")
    assert(got.count() === ev.count())
    assert(got.select(cols.map(col): _*).except(ev).count() === 0)
    // second INSERT: appends; VERSION AS OF walks back to the first
    spark.sql("INSERT INTO gtest.ns.ticks SELECT event_id + 10000000, ts, user_id, event_type, value FROM ev_src WHERE event_type = 'view'")
    val n2 = spark.sql("SELECT * FROM gtest.ns.ticks").count()
    assert(n2 > ev.count())
    val verRows = StoreLog.listVersions(s"$root/ns/ticks")
    val v1 = verRows.dropRight(1).last
    assert(spark.sql(s"SELECT * FROM gtest.ns.ticks VERSION AS OF $v1").count() === ev.count())
    // predicate through SQL prunes and answers correctly
    val purchases = spark.sql(
      "SELECT count(*) AS n FROM gtest.ns.ticks WHERE event_type = 'purchase'")
      .head().getLong(0)
    assert(purchases === ev.filter(col("event_type") === "purchase").count())
    // INSERT OVERWRITE truncates to the new content, metadata survives
    spark.sql("INSERT OVERWRITE gtest.ns.ticks SELECT event_id, ts, user_id, event_type, value FROM ev_src WHERE event_type = 'click'")
    val afterOv = spark.sql("SELECT * FROM gtest.ns.ticks")
    assert(afterOv.count() === ev.filter(col("event_type") === "click").count())
    assert(spark.sql("SELECT * FROM gtest.ns.ticks WHERE event_type = 'view'").count() === 0)
    spark.sql("DROP TABLE gtest.ns.ticks")
    assert(!spark.sql("SHOW TABLES IN gtest.ns").collect().map(_.getString(1)).contains("ticks"))
  }

  test("GROUPED aggregate pushdown: GROUP BY partition column answers from the manifest") {
    import graft.sources.GraftAggScan
    val (dir, _) = buildStore(maxRecords = 100)
    spark.read.format("graft").load(dir).createOrReplaceTempView("gagg_fact")
    // AQE wraps stages in leaf QueryStageExec nodes — unwrap recursively
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scansOf)
    }
    def aggScan(df: org.apache.spark.sql.DataFrame) =
      scansOf(df.queryExecution.executedPlan).map(_.scan)
        .exists(_.isInstanceOf[GraftAggScan])
    val df = spark.sql(
      "SELECT event_type, count(*) AS n, count(user_id) AS nu, " +
        "min(event_id) AS lo, max(ts) AS tmax " +
        "FROM gagg_fact GROUP BY event_type ORDER BY event_type")
    assert(aggScan(df), s"grouped agg must be manifest-served: ${df.queryExecution.executedPlan}")
    val want = TsStore.load(spark, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("user_id")).as("nu"),
        min("event_id").as("lo"), max("ts").as("tmax"))
      .orderBy("event_type")
    assert(df.collect().toSeq === want.collect().toSeq)
    // grouping by a DATA column refuses (its values are not driver
    // metadata) and still answers right
    val byData = spark.sql(
      "SELECT user_id, count(*) AS n FROM gagg_fact GROUP BY user_id ORDER BY user_id LIMIT 5")
    assert(!aggScan(byData), "data-column grouping must not be manifest-served")
    assert(byData.count() === 5)
  }

  test("partition-EXACT filters: residual-free acceptance, A/B row parity, aggregates push under WHERE") {
    import graft.sources.GraftAggScan
    val (dir, _) = buildStore(maxRecords = 100)
    // A/B parity: every supported predicate shape answers exactly like
    // the engine's own read+filter (the filters return NO residual, so
    // the scan's file-level evaluation is the only enforcement)
    val preds = Seq(
      col("event_type") === "purchase",
      col("event_type").isin("purchase", "view"),
      col("event_type") =!= "view",
      col("event_type") > "purchase",
      col("event_type").startsWith("p") || col("event_type") === "view",
      col("event_type").isNotNull,
      !col("event_type").isin("click"))
    preds.foreach { p =>
      val got = spark.read.format("graft").load(dir).filter(p)
      val want = TsStore.load(spark, dir).filter(p)
      assert(got.count() === want.count(), s"pred $p")
      assert(got.count() > 0, s"degenerate fixture for pred $p")
    }
    // a MIXED predicate keeps the data conjunct residual and stays right
    val mixed = col("event_type") === "purchase" && col("value") > 50.0
    assert(spark.read.format("graft").load(dir).filter(mixed).count()
      === TsStore.load(spark, dir).filter(mixed).count())
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scansOf)
    }
    def aggScan(df: org.apache.spark.sql.DataFrame) =
      scansOf(df.queryExecution.executedPlan).map(_.scan)
        .exists(_.isInstanceOf[GraftAggScan])
    spark.read.format("graft").load(dir).createOrReplaceTempView("gexact_fact")
    // a partition-only WHERE leaves no post-scan filter, so the GROUPED
    // aggregate pushes: pure manifest walk over the surviving files
    val fAgg = spark.sql(
      "SELECT event_type, count(*) AS n, min(event_id) AS lo " +
        "FROM gexact_fact WHERE event_type IN ('purchase', 'view') " +
        "GROUP BY event_type ORDER BY event_type")
    assert(aggScan(fAgg),
      s"filtered grouped agg must be manifest-served: ${fAgg.queryExecution.executedPlan}")
    val wantAgg = TsStore.load(spark, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("event_id").as("lo"))
      .orderBy("event_type")
    assert(fAgg.collect().toSeq === wantAgg.collect().toSeq)
    // ungrouped under WHERE: one manifest-served row
    val fCount = spark.sql(
      "SELECT count(*) AS n FROM gexact_fact WHERE event_type = 'purchase'")
    assert(aggScan(fCount), "filtered COUNT(*) must be manifest-served")
    assert(fCount.collect().head.getLong(0)
      === TsStore.load(spark, dir).filter(col("event_type") === "purchase").count())
    // a DATA-column WHERE must NOT push the aggregate (residual filter)
    val dataF = spark.sql(
      "SELECT count(*) AS n FROM gexact_fact WHERE value > 50.0")
    assert(!aggScan(dataF), "data-column WHERE must refuse the agg pushdown")
  }

  test("null partition: exact filters and IS NULL semantics match the engine read") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft_nullp").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq[(Long, java.sql.Timestamp, String, Double)](
      (1L, t("2024-01-01 00:00:00"), "a", 1.0),
      (2L, t("2024-01-01 00:01:00"), "b", 2.0),
      (3L, t("2024-01-01 00:02:00"), null, 3.0),
      (4L, t("2024-01-01 00:03:00"), null, 4.0))
      .toDF("id", "ts", "k", "v")
    TsStore.write(df, dir, tsCol = "ts", uidCols = Seq("k"))
    val g = () => spark.read.format("graft").load(dir)
    // three-valued logic: a null partition is dropped by =/!=/IN, kept
    // by IS NULL, counted out of IS NOT NULL — exactly like the read
    val cases = Seq[(org.apache.spark.sql.Column, Seq[Long])](
      (col("k") === "a", Seq(1L)),
      (col("k") =!= "a", Seq(2L)),
      (col("k").isin("a", "b"), Seq(1L, 2L)),
      (col("k").isNull, Seq(3L, 4L)),
      (col("k").isNotNull, Seq(1L, 2L)),
      (col("k").isNull || col("k") === "b", Seq(2L, 3L, 4L)))
    cases.foreach { case (p, want) =>
      assert(g().filter(p).select("id").collect().map(_.getLong(0)).sorted.toSeq
        === want, s"pred $p")
    }
    // manifest-served filtered count over the null partition
    g().createOrReplaceTempView("gnullp_v")
    assert(spark.sql("SELECT count(*) AS n FROM gnullp_v WHERE k IS NULL")
      .collect().head.getLong(0) === 2L)
  }

  test("native INSERT INTO produces the canonical layout: tight disjoint per-file ts bounds, like the Scala write") {
    val root = Files.createTempDirectory("graft_nw").toString
    spark.conf.set("spark.sql.catalog.gnw", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnw.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnw.ns")
    spark.sql(
      """CREATE TABLE gnw.ns.ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |  event_type STRING, value DOUBLE)
        |USING graft PARTITIONED BY (event_type)""".stripMargin)
    // a deliberately UNSORTED source: the engine must impose the layout
    Tables.events(spark, TestSpark.sf001)
      .select(cols.map(col): _*)
      .orderBy(hash(col("event_id"))) // scrambled
      .createOrReplaceTempView("gnw_src")
    // small roll bound so the fixture splits partitions across files
    spark.conf.set("spark.graft.write.maxRecordsPerFile", "80")
    try spark.sql("INSERT INTO gnw.ns.ev SELECT * FROM gnw_src")
    finally spark.conf.unset("spark.graft.write.maxRecordsPerFile")
    val tablePath = s"$root/ns/ev"
    val snap = StoreLog.latest(tablePath).get
    assert(snap.files.nonEmpty)
    // every file carries recorded ts bounds + sizes (the INSERT commits
    // through the same stats machinery as the Scala append)
    snap.files.foreach { f =>
      assert(snap.stats.get(f).exists(_.contains("ts")),
        s"INSERT'd file $f must carry ts stats")
      assert(snap.sizes.contains(f), s"INSERT'd file $f must carry its size")
    }
    // canonical clustering: within each partition directory, the files'
    // ts ranges are DISJOINT (boundary-equality allowed) — the
    // repartitionByRange(uid, ts) + sort layout, imposed by the write's
    // required distribution/ordering
    val byDir = snap.files.groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(byDir.exists(_._2.size > 1),
      s"fixture must split at least one partition across files: ${byDir.view.mapValues(_.size).toMap}")
    byDir.foreach { case (dir, files) =>
      val ranges = files.map(f => snap.stats(f)("ts"))
        .map(cs => (cs.min.asInstanceOf[Long], cs.max.asInstanceOf[Long]))
        .sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, aHi), (bLo, _)) =>
          assert(bLo >= aHi, s"overlapping ts ranges in $dir: $ranges")
        case _ => ()
      }
    }
    // content round-trips
    val got = spark.sql("SELECT event_id, ts, user_id, event_type, value FROM gnw.ns.ev")
    val want = Tables.events(spark, TestSpark.sf001).select(cols.map(col): _*)
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
    // INSERT OVERWRITE = versioned REPLACE: new content live, the
    // pre-overwrite version still VERSION AS OF-readable, props intact
    val vBefore = StoreLog.latest(tablePath).get.version
    spark.sql("INSERT OVERWRITE gnw.ns.ev " +
      "SELECT event_id, ts, user_id, event_type, value FROM gnw_src WHERE event_id % 2 = 0")
    val evens = want.filter(col("event_id") % 2 === 0).count()
    assert(spark.sql("SELECT count(*) FROM gnw.ns.ev").head().getLong(0) === evens)
    assert(spark.sql(s"SELECT count(*) FROM gnw.ns.ev VERSION AS OF $vBefore")
      .head().getLong(0) === want.count())
    assert(StoreLog.latest(tablePath).get.props.contains(graft.sources.GraftTable.SchemaProp),
      "catalog metadata must survive INSERT OVERWRITE")
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; destructive changes refuse") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graft_alt").toString
    spark.conf.set("spark.sql.catalog.galt", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.galt.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS galt.ns")
    spark.sql(
      """CREATE TABLE galt.ns.t (id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, t("2024-01-01 00:00:00"), "a", 1.0), (2L, t("2024-01-01 00:01:00"), "b", 2.0))
      .toDF("id", "ts", "k", "v").createOrReplaceTempView("galt_src")
    spark.sql("INSERT INTO galt.ns.t SELECT * FROM galt_src")
    val tablePath = s"$root/ns/t"
    val filesBefore = StoreLog.latest(tablePath).get.files
    spark.sql("ALTER TABLE galt.ns.t ADD COLUMN score DOUBLE")
    // metadata-only: same data files, new declared schema
    assert(StoreLog.latest(tablePath).get.files === filesBefore,
      "ALTER ADD COLUMN must not touch data files")
    val widened = spark.sql("SELECT id, score FROM galt.ns.t ORDER BY id").collect()
    assert(widened.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(widened.forall(_.isNullAt(1)), "pre-ALTER rows must read NULL")
    // post-ALTER insert carries real values; old rows stay NULL
    spark.sql("INSERT INTO galt.ns.t VALUES (3, TIMESTAMP '2024-01-02 00:00:00', 'a', 3.0, 9.5)")
    val all = spark.sql("SELECT id, score FROM galt.ns.t ORDER BY id").collect()
    assert(all.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
      === Seq(null, null, 9.5))
    // refusals: NOT NULL, RENAME of the time column (data-column
    // renames are supported via column mapping — RenameColSpec),
    // DROP of the time/partition columns
    intercept[Exception] {
      spark.sql("ALTER TABLE galt.ns.t ADD COLUMN bad INT NOT NULL") }
    intercept[Exception] { spark.sql("ALTER TABLE galt.ns.t RENAME COLUMN ts TO tstamp") }
    intercept[Exception] { spark.sql("ALTER TABLE galt.ns.t DROP COLUMN ts") }
    intercept[Exception] { spark.sql("ALTER TABLE galt.ns.t DROP COLUMN k") }
    // the declared schema survives the refusals untouched
    assert(spark.table("galt.ns.t").schema.fieldNames.toSeq ===
      Seq("id", "ts", "k", "v", "score"))
  }

  test("ALTER TABLE DROP COLUMN: metadata-only, history keeps the era's schema, re-ADD refuses") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graft_dropc").toString
    spark.conf.set("spark.sql.catalog.gdc", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdc.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdc.ns")
    spark.sql(
      """CREATE TABLE gdc.ns.t (id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE, score DOUBLE)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, t("2024-01-01 00:00:00"), "a", 1.0, 10.0),
        (2L, t("2024-01-01 00:01:00"), "b", 2.0, 20.0))
      .toDF("id", "ts", "k", "v", "score").createOrReplaceTempView("gdc_src")
    spark.sql("INSERT INTO gdc.ns.t SELECT * FROM gdc_src")
    val tablePath = s"$root/ns/t"
    val vBefore = StoreLog.latest(tablePath).get.version
    val filesBefore = StoreLog.latest(tablePath).get.files
    spark.sql("ALTER TABLE gdc.ns.t DROP COLUMN score")
    // metadata-only: data files untouched, column gone from the contract
    assert(StoreLog.latest(tablePath).get.files === filesBefore)
    assert(spark.table("gdc.ns.t").schema.fieldNames.toSeq === Seq("id", "ts", "k", "v"))
    assert(spark.sql("SELECT * FROM gdc.ns.t").schema.fieldNames.toSeq
      === Seq("id", "ts", "k", "v"))
    // props are per-manifest: the PRE-drop version still declares (and reads) it
    val hist = spark.sql(
      s"SELECT id, score FROM gdc.ns.t VERSION AS OF $vBefore ORDER BY id").collect()
    assert(hist.map(_.getDouble(1)).toSeq === Seq(10.0, 20.0),
      "time travel must read the dropped column's era values")
    // INSERT against the narrowed contract works
    spark.sql("INSERT INTO gdc.ns.t VALUES (3, TIMESTAMP '2024-01-02 00:00:00', 'a', 3.0)")
    assert(spark.sql("SELECT id FROM gdc.ns.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // re-ADD refuses: old files still physically carry the column
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdc.ns.t ADD COLUMN score DOUBLE") }
    def root0(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root0(t.getCause)
    assert((e.getMessage + root0(e).getMessage).contains("dropped"),
      s"re-ADD refusal must explain the tombstone: ${e.getMessage}")
    // a DIFFERENT name is fine
    spark.sql("ALTER TABLE gdc.ns.t ADD COLUMN score2 DOUBLE")
    assert(spark.table("gdc.ns.t").schema.fieldNames.toSeq
      === Seq("id", "ts", "k", "v", "score2"))
  }

  test("RENAME TABLE moves the store with its history; refuses under a fresh lease") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graft_ren").toString
    spark.conf.set("spark.sql.catalog.gren", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gren.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gren.ns")
    spark.sql(
      """CREATE TABLE gren.ns.t (id BIGINT, ts TIMESTAMP, k STRING)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    spark.sql("INSERT INTO gren.ns.t VALUES (1, TIMESTAMP '2024-01-01 00:00:00', 'a')")
    val vFirst = StoreLog.latest(s"$root/ns/t").get.version
    spark.sql("INSERT INTO gren.ns.t VALUES (2, TIMESTAMP '2024-01-01 00:01:00', 'b')")
    spark.sql("ALTER TABLE gren.ns.t RENAME TO ns.t2")
    assert(spark.sql("SELECT id FROM gren.ns.t2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    intercept[Exception] { spark.table("gren.ns.t").collect() }
    // the full time-travel history rode along (paths are store-relative)
    assert(spark.sql(s"SELECT id FROM gren.ns.t2 VERSION AS OF $vFirst").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    // refuses onto an existing table
    spark.sql(
      """CREATE TABLE gren.ns.other (id BIGINT, ts TIMESTAMP)
        |USING graft""".stripMargin)
    intercept[Exception] { spark.sql("ALTER TABLE gren.ns.t2 RENAME TO ns.other") }
    // refuses while a writer lease is fresh (mid-commit writer)
    val lease = new java.io.File(s"${StoreLog.logDir(s"$root/ns/t2")}/.lease_rentest")
    java.nio.file.Files.write(lease.toPath,
      System.currentTimeMillis().toString.getBytes("UTF-8"))
    val e = intercept[Exception] { spark.sql("ALTER TABLE gren.ns.t2 RENAME TO ns.t3") }
    def root0(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root0(t.getCause)
    assert((e.getMessage + root0(e).getMessage).contains("lease"))
    assert(new java.io.File(s"$root/ns/t2").exists(), "refused RENAME must not move")
  }

  test("Scala-API writes WIDEN a catalog-declared schema; dropped tombstones stay dropped") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graft_widen").toString
    spark.conf.set("spark.sql.catalog.gwid", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwid.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwid.ns")
    spark.sql(
      """CREATE TABLE gwid.ns.t (id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    spark.sql("INSERT INTO gwid.ns.t VALUES (1, TIMESTAMP '2024-01-01 00:00:00', 'a', 1.0)")
    val tablePath = s"$root/ns/t"
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // an APPEND through the Scala API carries an extra column: the
    // declared schema must widen in the same commit so catalog readers
    // see the evolution (no stale narrow contract)
    TsStore.write(
      Seq((10L, t("2024-06-01 00:00:00"), "b", 10.0, "extra"))
        .toDF("id", "ts", "k", "v", "w"),
      tablePath, tsCol = "ts", uidCols = Seq("k"),
      mode = org.apache.spark.sql.SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    assert(spark.table("gwid.ns.t").schema.fieldNames.toSeq
      === Seq("id", "ts", "k", "v", "w"))
    val rows = spark.sql("SELECT id, w FROM gwid.ns.t ORDER BY id").collect()
    assert(rows.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq
      === Seq(null, "extra"))
    // format("graft") agrees with the catalog (declared schema preferred)
    assert(spark.read.format("graft").load(tablePath).schema.fieldNames.toSeq
      === Seq("id", "ts", "k", "v", "w"))
    // after DROP COLUMN w, a Scala write carrying w must NOT resurface it
    spark.sql("ALTER TABLE gwid.ns.t DROP COLUMN w")
    TsStore.write(
      Seq((20L, t("2024-07-01 00:00:00"), "c", 20.0, "zombie"))
        .toDF("id", "ts", "k", "v", "w"),
      tablePath, tsCol = "ts", uidCols = Seq("k"),
      mode = org.apache.spark.sql.SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    assert(spark.table("gwid.ns.t").schema.fieldNames.toSeq
      === Seq("id", "ts", "k", "v"),
      "a dropped column must stay dropped through write-side widening")
  }

  test("DROP TABLE refuses while a writer lease is fresh; proceeds once it expires") {
    val root = Files.createTempDirectory("graft_dropg").toString
    spark.conf.set("spark.sql.catalog.gdrop", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdrop.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdrop.ns")
    spark.sql(
      """CREATE TABLE gdrop.ns.t (id BIGINT, ts TIMESTAMP, k STRING)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    val tablePath = s"$root/ns/t"
    // a FRESH lease = a live writer mid-commit: DROP must refuse
    val lease = new java.io.File(s"${StoreLog.logDir(tablePath)}/.lease_droptest")
    java.nio.file.Files.write(lease.toPath,
      System.currentTimeMillis().toString.getBytes("UTF-8"))
    val e = intercept[Exception] { spark.sql("DROP TABLE gdrop.ns.t") }
    def root0(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root0(t.getCause)
    assert((e.getMessage + root0(e).getMessage).contains("lease"),
      s"refusal must name the lease: ${e.getMessage}")
    assert(new java.io.File(tablePath).exists(), "refused DROP must not delete anything")
    // lease expired (crashed writer): DROP proceeds
    assert(lease.setLastModified(
      System.currentTimeMillis() - StoreLog.WriterLeaseMs - 60000))
    spark.sql("DROP TABLE gdrop.ns.t")
    assert(!new java.io.File(tablePath).exists())
  }

  test("SQL DELETE FROM rewrites ONLY matching files; pre-delete version stays VERSION AS OF-readable") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graft_sqldel").toString
    spark.conf.set("spark.sql.catalog.gdel", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdel.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdel.ns")
    spark.sql(
      """CREATE TABLE gdel.ns.t (id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // two INSERTs → two files per partition, with DISJOINT id ranges so
    // manifest stats can prove which file holds the victim
    Seq.tabulate(10)(i => (i + 1L, t(s"2024-01-01 00:0${i % 10}:00"), if (i % 2 == 0) "a" else "b", i * 1.0))
      .toDF("id", "ts", "k", "v").createOrReplaceTempView("gdel_src1")
    Seq.tabulate(10)(i => (i + 101L, t(s"2024-01-02 00:0${i % 10}:00"), if (i % 2 == 0) "a" else "b", i * 2.0))
      .toDF("id", "ts", "k", "v").createOrReplaceTempView("gdel_src2")
    spark.sql("INSERT INTO gdel.ns.t SELECT * FROM gdel_src1")
    spark.sql("INSERT INTO gdel.ns.t SELECT * FROM gdel_src2")
    val tablePath = s"$root/ns/t"
    val before = StoreLog.latest(tablePath).get
    assert(before.files.count(_.startsWith("k=a/")) >= 2,
      s"two inserts must leave >=2 files under k=a, got ${before.files}")
    val vBefore = before.version
    // the victim row lives in exactly ONE file (sorted writes → disjoint
    // id ranges per file; stats prove which)
    spark.sql("DELETE FROM gdel.ns.t WHERE k = 'a' AND id = 3")
    val after = StoreLog.latest(tablePath).get
    val removed = before.files.toSet -- after.files.toSet
    val added = after.files.toSet -- before.files.toSet
    assert(removed.size === 1, s"only the matching file may be rewritten, removed=$removed")
    assert(removed.forall(_.startsWith("k=a/")) && added.forall(_.startsWith("k=a/")),
      s"k=b files must be untouched: removed=$removed added=$added")
    // file granularity: every OTHER k=a file survives identically
    assert((before.files.toSet - removed.head).subsetOf(after.files.toSet))
    // content: live view lost exactly the victim row
    assert(spark.sql("SELECT count(*) FROM gdel.ns.t").head().getLong(0) === 19L)
    assert(spark.sql("SELECT count(*) FROM gdel.ns.t WHERE id = 3").head().getLong(0) === 0L)
    // time travel: the pre-delete version still shows it
    assert(spark.sql(s"SELECT count(*) FROM gdel.ns.t VERSION AS OF $vBefore WHERE id = 3")
      .head().getLong(0) === 1L)
    // a DELETE with no matches commits nothing new
    val vAfter = StoreLog.latest(tablePath).get.version
    spark.sql("DELETE FROM gdel.ns.t WHERE id = 99999")
    assert(StoreLog.latest(tablePath).get.version === vAfter,
      "a no-match DELETE must not commit a new version")
    // full-table DELETE (no WHERE) works through the same verb
    spark.sql("DELETE FROM gdel.ns.t")
    assert(spark.sql("SELECT count(*) FROM gdel.ns.t").head().getLong(0) === 0L)
    spark.sql("DROP TABLE gdel.ns.t")
  }

  test("SQL UPDATE / MERGE INTO / subquery DELETE via copy-on-write row-level operations") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graft_dml").toString
    spark.conf.set("spark.sql.catalog.gdml", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdml.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.ns")
    spark.sql(
      """CREATE TABLE gdml.ns.t (id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, t("2024-01-01 00:00:00"), "a", 1.0), (2L, t("2024-01-01 00:01:00"), "a", 2.0),
        (3L, t("2024-01-01 00:02:00"), "b", 3.0), (4L, t("2024-01-01 00:03:00"), "b", 4.0))
      .toDF("id", "ts", "k", "v").createOrReplaceTempView("gdml_src")
    spark.sql("INSERT INTO gdml.ns.t SELECT * FROM gdml_src")
    val tablePath = s"$root/ns/t"
    // the _file metadata column names each row's data file
    val files = spark.sql("SELECT DISTINCT _file FROM gdml.ns.t")
      .collect().map(_.getString(0)).toSet
    assert(files === StoreLog.latest(tablePath).get.files.toSet)
    // UPDATE: copy-on-write of exactly the file holding the victim
    val before = StoreLog.latest(tablePath).get
    val vBefore = before.version
    spark.sql("UPDATE gdml.ns.t SET v = v * 10 WHERE id = 2")
    val after = StoreLog.latest(tablePath).get
    val removed = before.files.toSet -- after.files.toSet
    assert(removed.forall(_.startsWith("k=a/")),
      s"UPDATE id=2 must only rewrite the k=a file, removed=$removed")
    assert((before.files.toSet -- removed).subsetOf(after.files.toSet),
      "untouched files must survive an UPDATE identically")
    assert(spark.sql("SELECT v FROM gdml.ns.t WHERE id = 2").head().getDouble(0) === 20.0)
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t").head().getLong(0) === 4L)
    // pre-update state stays time-travelable
    assert(spark.sql(s"SELECT v FROM gdml.ns.t VERSION AS OF $vBefore WHERE id = 2")
      .head().getDouble(0) === 2.0)
    // MERGE INTO: matched update + not-matched insert in ONE commit
    Seq((2L, t("2024-01-02 00:00:00"), "a", 200.0),
        (9L, t("2024-01-02 00:01:00"), "b", 9.0))
      .toDF("id", "ts", "k", "v").createOrReplaceTempView("gdml_merge_src")
    val vPreMerge = StoreLog.latest(tablePath).get.version
    spark.sql("MERGE INTO gdml.ns.t AS tg USING gdml_merge_src AS s ON tg.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(StoreLog.latest(tablePath).get.version === vPreMerge + 1,
      "MERGE must land as one atomic manifest commit")
    val merged = spark.sql("SELECT id, v FROM gdml.ns.t ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(merged === Seq((1L, 1.0), (2L, 200.0), (3L, 3.0), (4L, 4.0), (9L, 9.0)))
    // DELETE with a subquery predicate — the metadata path cannot
    // express it; the group-based rewrite handles it
    spark.sql("DELETE FROM gdml.ns.t WHERE id IN (SELECT id FROM gdml_merge_src WHERE v > 100)")
    assert(spark.sql("SELECT id FROM gdml.ns.t ORDER BY id").as[Long].collect().toSeq
      === Seq(1L, 3L, 4L, 9L))
    // UPDATE may MOVE a row across partitions (the upsert contract
    // forbids this; copy-on-write rewrites the row wherever its new
    // partition value lands)
    spark.sql("UPDATE gdml.ns.t SET k = 'b' WHERE id = 1")
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t WHERE k = 'b'").head().getLong(0) === 4L)
    assert(spark.sql("SELECT count(*) FROM gdml.ns.t WHERE k = 'a'").head().getLong(0) === 0L)
    assert(spark.sql("SELECT id FROM gdml.ns.t ORDER BY id").as[Long].collect().toSeq
      === Seq(1L, 3L, 4L, 9L), "a partition-moving UPDATE must not lose or duplicate rows")
  }

  test("CALL system.compact with a where scope touches only the named partitions") {
    val root = Files.createTempDirectory("graft_proc_scope").toString
    spark.conf.set("spark.sql.catalog.gprocsc", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprocsc.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gprocsc.ns")
    spark.sql(
      """CREATE TABLE gprocsc.ns.tc (
        |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |  event_type STRING, value DOUBLE)
        |USING graft PARTITIONED BY (event_type)""".stripMargin)
    val ev = Tables.events(spark, TestSpark.sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.createOrReplaceTempView("proc_scope_src")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO gprocsc.ns.tc SELECT event_id + ${i * 10000000L}, ts, " +
        "user_id, event_type, value FROM proc_scope_src")
    }
    val path = s"$root/ns/tc"
    val before = StoreLog.latest(path).get
    val outOfScope = before.files.filterNot(_.startsWith("event_type=view/")).sorted
    assert(before.files.count(_.startsWith("event_type=view/")) > 1,
      "fixture must be fragmented inside the scope")
    // scoped compact: ONLY the view partition is rewritten; every other
    // partition's live-file list is name-identical afterwards
    val c = spark.sql("CALL gprocsc.system.compact(table => 'ns.tc', " +
      "max_files => 1, where => \"event_type = 'view'\")").head()
    assert(c.getLong(0) > before.version)
    assert(c.getInt(1) === 1, "exactly the one in-scope partition is compacted")
    val after = StoreLog.latest(path).get
    assert(after.files.count(_.startsWith("event_type=view/")) === 1,
      "the in-scope partition must collapse to one file")
    assert(after.files.filterNot(_.startsWith("event_type=view/")).sorted
      === outOfScope, "out-of-scope partitions must keep their exact file sets")
    assert(after.replaced === Seq("event_type=view"),
      "the commit's replaced record must name only the scope")
    assert(spark.sql("SELECT count(*) FROM gprocsc.ns.tc").head().getLong(0)
      === ev.count() * 3)
    // re-running the same scoped call is a version-stable no-op: the
    // scope is already compact and carries no deletion vectors
    val c2 = spark.sql("CALL gprocsc.system.compact(table => 'ns.tc', " +
      "max_files => 1, where => \"event_type = 'view'\")").head()
    assert(c2.getLong(0) === after.version && c2.getInt(1) === 0)
    // a predicate admitting nothing is a version-stable no-op too
    val c3 = spark.sql("CALL gprocsc.system.compact(table => 'ns.tc', " +
      "max_files => 1, where => \"event_type = 'no_such_type'\")").head()
    assert(c3.getLong(0) === after.version && c3.getInt(1) === 0)
  }

  test("CALL procedures: vacuum / compact / zorder from pure SQL") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_proc").toString
    spark.conf.set("spark.sql.catalog.gproc", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.ns")
    spark.sql(
      """CREATE TABLE gproc.ns.t (
        |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |  event_type STRING, value DOUBLE)
        |USING graft PARTITIONED BY (event_type)""".stripMargin)
    // many small appends → fragmented partitions
    val ev = Tables.events(spark, TestSpark.sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.createOrReplaceTempView("proc_src")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO gproc.ns.t SELECT event_id + ${i * 10000000L}, ts, " +
        "user_id, event_type, value FROM proc_src")
    }
    val path = s"$root/ns/t"
    val before = StoreLog.latest(path).get
    val maxPer = before.files.groupBy(f => f.substring(0, f.lastIndexOf('/')))
      .values.map(_.size).max
    assert(maxPer > 1, "fixture must be fragmented")
    // COMPACT: partitions collapse to one file each, content preserved
    val c = spark.sql("CALL gproc.system.compact(table => 'ns.t', max_files => 1)").head()
    assert(c.getLong(0) > before.version)
    val afterC = StoreLog.latest(path).get
    assert(afterC.files.groupBy(f => f.substring(0, f.lastIndexOf('/')))
      .values.forall(_.size == 1), "compact must leave one file per partition")
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) === ev.count() * 3)
    // ZORDER: a clustered rewrite commits a new version, content intact
    val z = spark.sql("CALL gproc.system.zorder('ns.t', 'user_id,value')").head()
    assert(z.getLong(0) > afterC.version)
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) === ev.count() * 3)
    // HISTORY (before vacuum prunes old manifests): one row per
    // retained version, ascending, with the rewrites' replaced records
    locally {
      val h = spark.sql("CALL gproc.system.history('ns.t')").collect()
      val versions = StoreLog.listVersions(path).sorted
      assert(h.map(_.getLong(0)).toSeq === versions,
        s"history must list the retained versions: ${h.map(_.getLong(0)).mkString(",")}")
      assert(h.map(_.getInt(2)).last === StoreLog.latest(path).get.files.size)
      assert(h.count(_.getInt(3) > 0) >= 2,
        "the compact + zorder commits must record replaced partitions")
      assert(h.forall(r => r.getLong(5) >= 0L))
      val times = h.map(_.getTimestamp(1).getTime).toSeq
      assert(times === times.sorted, "commit times must ascend")
    }
    // VACUUM: the replaced pre-compact/zorder files reclaim (age them
    // past the lease window first — vacuum spares young dead files)
    val live = StoreLog.latest(path).get.files.toSet
    val dead = StoreLog.listDataFiles(path).filterNot(live)
    assert(dead.nonEmpty, "rewrites must have left dead files")
    val aged = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * StoreLog.WriterLeaseMs)
    dead.foreach(f => Files.setLastModifiedTime(
      java.nio.file.Paths.get(path, f), aged))
    // an age window spanning the whole (young) chain retains every
    // version — the SQL face of the retain_hours parameter
    val vAll = StoreLog.listVersions(path)
    spark.sql("CALL gproc.system.vacuum('ns.t', retain => 1, " +
      "retain_hours => 24.0)").head()
    assert(StoreLog.listVersions(path) === vAll,
      "a 24h retain_hours must keep the whole young chain")
    val v = spark.sql("CALL gproc.system.vacuum('ns.t')").head()
    assert(v.getInt(0) === dead.size,
      s"vacuum must reclaim the ${dead.size} dead files, got ${v.getInt(0)}")
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").head().getLong(0) === ev.count() * 3)
    // SHOW PROCEDURES surface
    val procs = spark.sql("SHOW PROCEDURES IN gproc.system").collect().map(_.getString(0))
    assert(Set("vacuum", "compact", "zorder").subsetOf(
      procs.map(_.split('.').last).toSet) || procs.nonEmpty)
    // HISTORY after vacuum: only the RETAINED versions are listed
    val h = spark.sql("CALL gproc.system.history('ns.t')").collect()
    assert(h.map(_.getLong(0)).toSeq === StoreLog.listVersions(path).sorted,
      "post-vacuum history must track the retained manifest set")
    // DETAIL: one row per live file, manifest-recorded bytes, no RPCs
    val det = spark.sql("CALL gproc.system.detail('ns.t')").collect()
    val snap = StoreLog.latest(path).get
    assert(det.map(_.getString(0)).toSeq === snap.files.sorted)
    assert(det.forall(r => r.getLong(2) > 0L),
      "every live file must carry a manifest-recorded byte length")
    assert(det.forall(r => r.getString(1).startsWith("event_type=")))
  }

  test("SHOW PARTITIONS / DROP PARTITION / TRUNCATE TABLE from pure SQL") {
    val root = Files.createTempDirectory("graft_pm").toString
    spark.conf.set("spark.sql.catalog.gpm", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpm.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpm.ns")
    spark.sql(
      """CREATE TABLE gpm.ns.t (id BIGINT, ts TIMESTAMP, k STRING, v DOUBLE)
        |USING graft PARTITIONED BY (k)""".stripMargin)
    spark.sql("INSERT INTO gpm.ns.t VALUES " +
      "(1, TIMESTAMP '2024-01-01 00:00:00', 'a', 1.0), " +
      "(2, TIMESTAMP '2024-01-01 00:01:00', 'b', 2.0), " +
      "(3, TIMESTAMP '2024-01-01 00:02:00', 'c', 3.0), " +
      "(4, TIMESTAMP '2024-01-01 00:03:00', 'b', 4.0)")
    val tablePath = s"$root/ns/t"
    // SHOW PARTITIONS: a pure manifest walk (zero file IO)
    assert(spark.sql("SHOW PARTITIONS gpm.ns.t").collect()
      .map(_.getString(0)).sorted.toSeq === Seq("k=a", "k=b", "k=c"))
    assert(spark.sql("SHOW PARTITIONS gpm.ns.t PARTITION (k='b')").collect()
      .map(_.getString(0)).toSeq === Seq("k=b"))
    // DROP PARTITION: versioned copy-on-write — rows gone, history kept
    val vBeforeDrop = StoreLog.latest(tablePath).get.version
    spark.sql("ALTER TABLE gpm.ns.t DROP PARTITION (k = 'b')")
    assert(spark.sql("SELECT id FROM gpm.ns.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(spark.sql("SHOW PARTITIONS gpm.ns.t").collect()
      .map(_.getString(0)).sorted.toSeq === Seq("k=a", "k=c"))
    assert(spark.sql(
      s"SELECT count(*) FROM gpm.ns.t VERSION AS OF $vBeforeDrop").head().getLong(0) === 4L,
      "the dropped partition must stay time-travelable")
    // dropping a partition that is not there: IF EXISTS no-ops, bare raises
    spark.sql("ALTER TABLE gpm.ns.t DROP IF EXISTS PARTITION (k = 'zzz')")
    intercept[Exception] { spark.sql("ALTER TABLE gpm.ns.t DROP PARTITION (k = 'zzz')") }
    // ADD PARTITION refuses: partitions materialize through writes
    intercept[Exception] { spark.sql("ALTER TABLE gpm.ns.t ADD PARTITION (k = 'new')") }
    // TRUNCATE: a versioned empty — count 0, pre-truncate history intact
    val vBeforeTrunc = StoreLog.latest(tablePath).get.version
    spark.sql("TRUNCATE TABLE gpm.ns.t")
    assert(spark.sql("SELECT count(*) FROM gpm.ns.t").head().getLong(0) === 0L)
    assert(spark.sql(
      s"SELECT count(*) FROM gpm.ns.t VERSION AS OF $vBeforeTrunc").head().getLong(0) === 2L,
      "TRUNCATE must be versioned, not a log reset")
    // the table stays writable after TRUNCATE
    spark.sql("INSERT INTO gpm.ns.t VALUES (9, TIMESTAMP '2024-02-01 00:00:00', 'z', 9.0)")
    assert(spark.sql("SELECT id FROM gpm.ns.t").collect().map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("TIMESTAMP AS OF resolves against manifest commit times") {
    val (dir, v) = buildStore()
    val root = Files.createTempDirectory("graft_cat_ts").toString
    // adopt the existing store under the catalog root via a symlink-free
    // copy: just point a table dir at a fresh store built in place
    spark.conf.set("spark.sql.catalog.gts", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gts.root", root)
    val tdir = new java.io.File(s"$root/t")
    org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(dir), tdir)
    val tsMs = StoreLog.read(s"$root/t", v - 1).timestampMs
    val iso = java.time.Instant.ofEpochMilli(tsMs).toString
    val old = spark.sql(s"SELECT * FROM gts.t TIMESTAMP AS OF '$iso'")
    assert(old.filter(col("version") === 2L).count() === 0)
    assert(old.count() === TsStore.load(spark, s"$root/t", asOf = Some(v - 1)).count())
  }
}
