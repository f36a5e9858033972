package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{StoreLog, Tables, TsStore}

/** Named version tags (the Iceberg tag/ref role): `CALL system.tag`
  * pins an era for `VERSION AS OF '<name>'` time travel AND for vacuum
  * retention — manifest, data files, and resolution chain survive
  * however far the tag falls behind the retention window.
  */
class TagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val events = Tables.events(spark, TestSpark.sf001)
  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value")

  test("vacuum retains a tagged era: manifest, files, and a rewritten delta chain") {
    val dir = Files.createTempDirectory("graft_tag").toString
    val base = events.select(cols.map(col): _*)
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    def upsertShift(k: Long, ver: Long): Unit =
      TsStore.upsert(spark, dir,
        base.filter(col("event_id") % 5 === k % 5)
          .withColumn("value", col("value") + lit(k.toDouble))
          .withColumn("version", lit(ver)),
        keyCols = Seq("event_id"), versionCol = "version",
        tsCol = "ts", uidCols = Seq("event_type"))
    upsertShift(1, 2) // v2 — a DELTA over the v1 checkpoint
    val taggedV = StoreLog.latestVersion(dir).get
    val taggedContent = TsStore.load(spark, dir).orderBy("event_id").collect()
    // pin it the way CALL system.tag does: a graft.tag.* metadata commit
    val cur = StoreLog.latest(dir).get
    StoreLog.commit(dir, cur.version, Seq.empty, cur.files,
      parent = Some(cur),
      setProps = Map(s"${StoreLog.TagPropPrefix}era2" -> taggedV.toString))
    assert(StoreLog.tagVersion(dir, "era2") === Some(taggedV))
    upsertShift(2, 3)
    upsertShift(3, 4)
    val latestContent = TsStore.load(spark, dir).orderBy("event_id").collect()
    // age every dead file and the lease so vacuum can reclaim
    val live = StoreLog.latest(dir).get.files.toSet ++
      StoreLog.read(dir, taggedV).files.toSet
    val aged = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * StoreLog.WriterLeaseMs)
    StoreLog.listDataFiles(dir).foreach(f => Files.setLastModifiedTime(
      java.nio.file.Paths.get(dir, f), aged))
    val reclaimed = TsStore.vacuum(dir, retainVersions = 1)
    assert(reclaimed > 0, "the untagged dropped eras must reclaim dead files")
    // the tagged version survives the retention window...
    val versionsAfter = StoreLog.listVersions(dir)
    assert(versionsAfter.contains(taggedV),
      s"tagged version $taggedV must survive vacuum (got $versionsAfter)")
    assert(versionsAfter.size === 2, "exactly the tag + the latest survive")
    // ...its delta chain was rewritten self-resolvable (v1 is gone)...
    assert(!versionsAfter.contains(taggedV - 1))
    val back = TsStore.load(spark, dir, asOf = Some(taggedV))
      .orderBy("event_id").collect()
    assert(back.toSeq === taggedContent.toSeq,
      "the tagged era must read back exactly post-vacuum")
    // ...its files survived on disk, the latest stays intact
    StoreLog.read(dir, taggedV).files.foreach(f =>
      assert(Files.exists(java.nio.file.Paths.get(dir, f)), s"tagged file $f"))
    assert(TsStore.load(spark, dir).orderBy("event_id").collect().toSeq
      === latestContent.toSeq)
    assert(live.forall(f => Files.exists(java.nio.file.Paths.get(dir, f))))
  }

  test("SQL face: tag / tags / drop_tag, VERSION AS OF a name, refusals") {
    val root = Files.createTempDirectory("graft_tagsql").toString
    spark.conf.set("spark.sql.catalog.gtag",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtag.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtag.ns")
    spark.sql(
      """CREATE TABLE gtag.ns.t (
        |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |  event_type STRING, value DOUBLE)
        |USING graft PARTITIONED BY (event_type)""".stripMargin)
    events.select(cols.map(col): _*).limit(500)
      .createOrReplaceTempView("tag_src")
    spark.sql("INSERT INTO gtag.ns.t SELECT * FROM tag_src")
    val n1 = spark.sql("SELECT count(*) FROM gtag.ns.t").head().getLong(0)
    // pin the current version under a name (default version arg)
    val t = spark.sql("CALL gtag.system.tag('ns.t', 'pre_growth')").head()
    assert(t.getString(0) === "pre_growth")
    spark.sql("INSERT INTO gtag.ns.t SELECT * FROM tag_src")
    val n2 = spark.sql("SELECT count(*) FROM gtag.ns.t").head().getLong(0)
    assert(n2 === 2 * n1)
    // VERSION AS OF resolves the tag name (and still takes numbers)
    assert(spark.sql("SELECT count(*) FROM gtag.ns.t VERSION AS OF 'pre_growth'")
      .head().getLong(0) === n1)
    assert(spark.sql(s"SELECT count(*) FROM gtag.ns.t VERSION AS OF ${t.getLong(1)}")
      .head().getLong(0) === n1)
    // listing
    val tags = spark.sql("CALL gtag.system.tags('ns.t')").collect()
    assert(tags.map(_.getString(0)).toSeq === Seq("pre_growth"))
    // re-tag moves the pin (Iceberg REPLACE TAG behavior)
    spark.sql("CALL gtag.system.tag('ns.t', 'pre_growth')")
    assert(spark.sql("SELECT count(*) FROM gtag.ns.t VERSION AS OF 'pre_growth'")
      .head().getLong(0) === n2)
    // refusals: unknown tag in VERSION AS OF, unretained version,
    // malformed name, direct SET of the managed prop
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM gtag.ns.t VERSION AS OF 'no_such_tag'").collect())
      .getMessage.contains("no_such_tag"))
    assert(intercept[Exception](spark.sql(
      "CALL gtag.system.tag('ns.t', 'ghost', version => 999)").collect())
      .getMessage.contains("not a retained"))
    assert(intercept[Exception](spark.sql(
      "CALL gtag.system.tag('ns.t', 'bad name')").collect())
      .getMessage.contains("must be"))
    // all-digit names refuse: VERSION AS OF parses numbers FIRST, so
    // such a tag would be silently shadowed by the version of that id
    assert(intercept[Exception](spark.sql(
      "CALL gtag.system.tag('ns.t', '7')").collect())
      .getMessage.contains("all digits"))
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE gtag.ns.t SET TBLPROPERTIES('graft.tag.x' = '1')"))
      .getMessage.contains("managed"))
    // drop_tag: the name stops resolving
    spark.sql("CALL gtag.system.drop_tag('ns.t', 'pre_growth')")
    assert(spark.sql("CALL gtag.system.tags('ns.t')").collect().isEmpty)
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM gtag.ns.t VERSION AS OF 'pre_growth'").collect())
      .getMessage.contains("pre_growth"))
  }

  test("tag / drop_tag retry through concurrent commit churn (no spurious CAS failure)") {
    import org.apache.spark.sql.SaveMode
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft_tag_churn").toString
    TsStore.write(events.select(cols.map(col): _*), dir,
      tsCol = "ts", uidCols = Seq("event_type"))
    StoreLog.ensure(dir)
    // two appender threads churn the version chain while the main
    // thread tags and drops — a metadata commit rebases trivially, so
    // every tag call must succeed however the CAS interleaves
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until 2).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          var i = 0
          try while (!stop.get() && i < 12) {
            val row = Seq((800000L + w * 1000 + i,
              java.sql.Timestamp.valueOf(s"2033-01-01 0$w:${10 + i % 45}:00"),
              1L, "view", 1.0)).toDF(cols: _*)
            TsStore.write(row, dir, tsCol = "ts", uidCols = Seq("event_type"),
              mode = SaveMode.Append,
              overlapPolicy = TsStore.OverlapPolicy.Allow)
            i += 1
          } catch { case t: Throwable => errs.add(t) }
        }
      })
    }
    try {
      (1 to 6).foreach { k =>
        val v = TsStore.tag(dir, s"churn$k")
        assert(StoreLog.tagVersion(dir, s"churn$k").contains(v))
        TsStore.dropTag(dir, s"churn$k")
        assert(StoreLog.tagVersion(dir, s"churn$k").isEmpty)
      }
    } finally {
      stop.set(true)
      pool.shutdown()
      pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS)
    }
    assert(errs.isEmpty, s"appender failed: ${Option(errs.peek()).map(_.toString)}")
  }
}
