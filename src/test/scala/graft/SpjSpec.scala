package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Tables, TsStore}

/** Storage-partitioned joins: with `spark.sql.sources.v2.bucketing
  * .enabled`, a graft scan reports its directory partitioning as a
  * KeyGroupedPartitioning (identity transform per partition column) and
  * plans one HasPartitionKey task group per live key — so an equi-join
  * of two stores partitioned on the same key, and a group-by on the
  * partition key, run with ZERO exchanges. At 100 TB that is the
  * difference between shuffling both fact tables and shuffling nothing.
  */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan)
    case s: ShuffleExchangeLike =>
      s +: s.children.flatMap(shuffles)
    case other => other.children.flatMap(shuffles)
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Two independent stores over the events fixture, both partitioned
    * by event_type (the join key).
    */
  private def buildStores(): (String, String) = {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val base = Tables.events(spark, TestSpark.sf001).select(cols.map(col): _*)
    val dirL = Files.createTempDirectory("graft_spj_l").toString
    val dirR = Files.createTempDirectory("graft_spj_r").toString
    // many small files per key: the stores must NOT collapse into a
    // single scan partition (SinglePartition satisfies every
    // distribution and would make the no-SPJ baseline shuffle-free too)
    TsStore.write(base, dirL, tsCol = "ts", uidCols = Seq("event_type"),
      maxRecordsPerFile = 200)
    TsStore.write(base.filter(col("event_id") % 3 === 0), dirR,
      tsCol = "ts", uidCols = Seq("event_type"), maxRecordsPerFile = 200)
    (dirL, dirR)
  }

  // keep bin-packing from folding the small fixture into one task
  private val splitConfs = Seq(
    "spark.sql.files.maxPartitionBytes" -> "16384",
    "spark.sql.files.openCostInBytes" -> "0")

  private def joined(dirL: String, dirR: String): DataFrame = {
    // sum(value) is NOT aggregate-pushdown-servable, so both sides stay
    // real file scans — exactly the shape whose shuffles SPJ removes
    val l = spark.read.format("graft").load(dirL)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_l"), sum(col("value").cast("long")).as("v_l"))
    val r = spark.read.format("graft").load(dirR)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_r"), sum(col("value").cast("long")).as("v_r"))
    // no orderBy: a global sort would add its own (legitimate) range
    // exchange — the assertion targets the JOIN's exchanges
    l.join(r, "event_type")
  }

  test("storage-partitioned join on the partition key plans zero shuffles") {
    val (dirL, dirR) = buildStores()

    // default layout first: the same query SHUFFLES both sides
    var expected: Seq[org.apache.spark.sql.Row] = Nil
    withConfs(splitConfs :+
      ("spark.sql.autoBroadcastJoinThreshold" -> "-1"): _*) {
      val df = joined(dirL, dirR)
      expected = df.collect().toSeq.sortBy(_.getString(0))
      assert(shuffles(df.queryExecution.executedPlan).nonEmpty,
        "fixture must need exchanges without SPJ")
    }
    assert(expected.nonEmpty)

    withConfs(splitConfs ++ Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"): _*) {
      val df = joined(dirL, dirR)
      val got = df.collect().toSeq.sortBy(_.getString(0))
      assert(got === expected)
      // the ENTIRE plan is exchange-free: scans are key-grouped, the
      // aggregates ride the scan clustering, the join co-locates
      assert(shuffles(df.queryExecution.executedPlan).isEmpty,
        s"SPJ plan must have no exchanges:\n${df.queryExecution.executedPlan}")
    }
  }

  test("group-by on the partition key aggregates without an exchange") {
    val (dirL, _) = buildStores()
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.read.format("graft").load(dirL)
        .groupBy("event_type").agg(sum(col("value").cast("long")).as("v"))
      val got = df.collect()
      assert(got.nonEmpty)
      assert(shuffles(df.queryExecution.executedPlan).isEmpty,
        s"partition-key aggregation must not shuffle:\n${df.queryExecution.executedPlan}")
    }
    // and the same frame off-conf agrees
    val off = spark.read.format("graft").load(dirL)
      .groupBy("event_type").agg(sum(col("value").cast("long")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true") {
      val on = spark.read.format("graft").load(dirL)
        .groupBy("event_type").agg(sum(col("value").cast("long")).as("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(on === off)
    }
  }

  test("SPJ layout survives pruning and stays correct under filters") {
    val (dirL, dirR) = buildStores()
    withConfs(splitConfs ++ Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"): _*) {
      // a partition-exact filter drops whole keys on one side;
      // pushPartValues re-aligns the sides without shuffling. sum()
      // keeps the aggregates UN-pushable — a bare count(*) would be
      // answered by the manifest agg pushdown (zero IO, tiny unkeyed
      // scan), which is the better plan but not the one under test
      val l = spark.read.format("graft").load(dirL)
        .filter(col("event_type") =!= "purchase")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_l"), sum(col("value").cast("long")).as("v_l"))
      val r = spark.read.format("graft").load(dirR)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_r"), sum(col("value").cast("long")).as("v_r"))
      val df = l.join(r, "event_type")
      val got = df.collect()
      assert(got.nonEmpty && !got.exists(_.getString(0) == "purchase"))
      assert(shuffles(df.queryExecution.executedPlan).isEmpty,
        s"pruned SPJ plan must stay exchange-free:\n${df.queryExecution.executedPlan}")
    }
  }

  private def sorts(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => sorts(a.executedPlan)
    case q: QueryStageExec => sorts(q.plan)
    case s: org.apache.spark.sql.execution.SortExec => s +: s.children.flatMap(sorts)
    case other => other.children.flatMap(sorts)
  }

  test("layout-ordered scan: per-uid window plans zero exchanges AND zero sorts") {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val base = Tables.events(spark, TestSpark.sf001).select(cols.map(col): _*)
    val dir = Files.createTempDirectory("graft_ord").toString
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"),
      maxRecordsPerFile = 500)
    assert(graft.sources.StoreLog.latest(dir).exists(
      _.props.get("graft.layout.tsSorted").contains("true")),
      "a fresh sorted write must record the layout-order contract")
    def windowed() = {
      import org.apache.spark.sql.expressions.Window
      spark.read.format("graft").load(dir)
        .withColumn("prev",
          lag(col("value"), 1).over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")))
    }
    // ordering is (event_type, ts): a window ordered by (ts, event_id)
    // still needs a sort for the tiebreaker — use ts alone for the pin
    def tsOnly() = {
      import org.apache.spark.sql.expressions.Window
      // the checksum aggregate groups on the partition key so it rides
      // the scan clustering — the WHOLE plan stays exchange-free
      spark.read.format("graft").load(dir)
        .withColumn("prev",
          lag(col("value"), 1).over(
            Window.partitionBy("event_type").orderBy("ts")))
        .groupBy("event_type")
        .agg(sum(col("prev").cast("long")).as("chk"), count(lit(1)).as("n"))
    }
    val off = windowed().groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true") {
      val df = tsOnly()
      df.collect()
      val plan = df.queryExecution.executedPlan
      assert(shuffles(plan).isEmpty, s"ordered window must not shuffle:\n$plan")
      assert(sorts(plan).isEmpty, s"ordered window must not sort:\n$plan")
      // and the full result agrees with the default path
      val on = windowed().groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(on === off)
    }
  }

  test("zorder clears the layout-order contract; the window sorts again") {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val base = Tables.events(spark, TestSpark.sf001).select(cols.map(col): _*)
    val dir = Files.createTempDirectory("graft_ord_z").toString
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"),
      maxRecordsPerFile = 500)
    TsStore.zorder(spark, dir, clusterCols = Seq("user_id", "value"),
      uidCols = Seq("event_type"))
    assert(graft.sources.StoreLog.latest(dir).exists(
      _.props.get("graft.layout.tsSorted").contains("false")),
      "zorder must clear the layout-order contract")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true") {
      import org.apache.spark.sql.expressions.Window
      val df = spark.read.format("graft").load(dir)
        .withColumn("prev", lag(col("value"), 1).over(
          Window.partitionBy("event_type").orderBy("ts")))
        .select(sum(col("prev").cast("long")).as("chk"))
      df.collect()
      assert(sorts(df.queryExecution.executedPlan).nonEmpty,
        "a z-clustered store must NOT claim ts order — the sort is required")
    }
  }

  test("upsert INHERITS the layout-order contract; overlapping append refuses ordering by bounds") {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val base = Tables.events(spark, TestSpark.sf001)
      .select(cols.map(col) :+ lit(1L).as("version"): _*)
    val dir = Files.createTempDirectory("graft_ord_up").toString
    TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
    val delta = base.filter(col("event_id") % 7 === 0)
      .withColumn("version", lit(2L))
    TsStore.upsert(spark, dir, delta, keyCols = Seq("event_id"),
      versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
    // the rewrite's files are canonically sorted — the contract survives
    assert(graft.sources.StoreLog.latest(dir).exists(
      _.props.get("graft.layout.tsSorted").contains("true")),
      "a sorted rewrite must inherit the layout-order contract")
    // an APPEND whose time range overlaps the stored one keeps the
    // within-file contract but breaks cross-file non-overlap — the
    // scan's bounds check must refuse the ordering claim (sort returns)
    TsStore.write(base.limit(500), dir, tsCol = "ts",
      uidCols = Seq("event_type"),
      mode = org.apache.spark.sql.SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    assert(graft.sources.StoreLog.latest(dir).exists(
      _.props.get("graft.layout.tsSorted").contains("true")))
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true") {
      import org.apache.spark.sql.expressions.Window
      val df = spark.read.format("graft").load(dir)
        .withColumn("prev", lag(col("value"), 1).over(
          Window.partitionBy("event_type").orderBy("ts")))
        .select(sum(col("prev").cast("long")).as("chk"))
      df.collect()
      assert(sorts(df.queryExecution.executedPlan).nonEmpty,
        "overlapping file bounds must refuse the ordering claim")
    }
  }

  test("one-sided shuffle: a plain frame aligns to the store's grouping") {
    // spark.sql.sources.v2.bucketing.shuffle.enabled lets Spark shuffle
    // ONLY the non-v2 side of a join into the store's key grouping —
    // the 100 TB fact side stays unshuffled
    val (dirL, _) = buildStores()
    withConfs(splitConfs ++ Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"): _*) {
      val l = spark.read.format("graft").load(dirL)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_l"), sum(col("value").cast("long")).as("v_l"))
      val dim = spark.createDataFrame(Seq(
        ("click", 1), ("purchase", 2), ("view", 3), ("signup", 4),
        ("logout", 5), ("login", 6))).toDF("event_type", "rank_no")
      val df = l.join(dim, "event_type")
      val got = df.collect()
      assert(got.nonEmpty)
      val sh = shuffles(df.queryExecution.executedPlan)
      // exactly the DIM side shuffles; the store side must not
      assert(sh.size === 1, s"expected one exchange (dim side only):\n" +
        s"${df.queryExecution.executedPlan}")
    }
  }

  test("ordered stores feed the as-of exec with zero exchanges and zero sorts") {
    // the flagship plan: AsofJoinExec requires exactly (keys, ts)
    // clustering + ordering — two co-partitioned ordered stores satisfy
    // both straight from their layout
    val dedup = Tables.events(spark, TestSpark.sf001)
      .groupBy("event_type", "ts")
      .agg(sum(floor(col("value"))).as("v"))
    val dirL = Files.createTempDirectory("graft_asof_l").toString
    val dirR = Files.createTempDirectory("graft_asof_r").toString
    TsStore.write(dedup, dirL, tsCol = "ts", uidCols = Seq("event_type"))
    TsStore.write(
      dedup.select(col("event_type"),
        (col("ts") - expr("INTERVAL 90 SECONDS")).as("r_ts"),
        col("v").as("r_v")),
      dirR, tsCol = "r_ts", uidCols = Seq("event_type"))
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true") {
      val l = spark.read.format("graft").load(dirL)
        .select("event_type", "ts", "v")
      val r = spark.read.format("graft").load(dirR)
        .select(col("event_type").as("r_et"), col("r_ts"), col("r_v"))
      val j = graft.operators.TimeSeries.asofJoinNative(
        l, r, leftKeys = Seq("event_type"), rightKeys = Seq("r_et"),
        leftTs = "ts", rightTs = "r_ts")
      val rows = j.collect()
      assert(rows.nonEmpty)
      val plan = j.queryExecution.executedPlan
      assert(shuffles(plan).isEmpty, s"ordered as-of must not shuffle:\n$plan")
      assert(sorts(plan).isEmpty, s"ordered as-of must not sort:\n$plan")
      // correctness vs the default (shuffled + sorted) path
      val defaults = withDefault {
        graft.operators.TimeSeries.asofJoinNative(
          l, r, leftKeys = Seq("event_type"), rightKeys = Seq("r_et"),
          leftTs = "ts", rightTs = "r_ts").collect()
      }
      assert(rows.map(_.toString).sorted.toSeq === defaults.map(_.toString).sorted.toSeq)
    }
  }

  // run `body` with the SPJ opt-ins temporarily OFF
  private def withDefault[A](body: => A): A = {
    val k = graft.sources.GraftScan.PreserveGroupingKey
    val old = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try body finally old match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("catalog SQL: two named graft tables join shuffle-free under the opt-in") {
    val root = Files.createTempDirectory("graft_spj_cat").toString
    val cat = "graftspjcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
    Tables.events(spark, TestSpark.sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("spj_cat_src")
    Seq("ta", "tb").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $cat.main.$t")
      spark.sql(s"CREATE TABLE $cat.main.$t USING graft " +
        "PARTITIONED BY (event_type) AS SELECT * FROM spj_cat_src" +
        (if (t == "tb") " WHERE event_id % 2 = 0" else ""))
    }
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        s"""SELECT l.event_type, l.v_l, r.v_r FROM
           | (SELECT event_type, sum(CAST(value AS BIGINT)) AS v_l
           |  FROM $cat.main.ta GROUP BY event_type) l
           | JOIN
           | (SELECT event_type, sum(CAST(value AS BIGINT)) AS v_r
           |  FROM $cat.main.tb GROUP BY event_type) r
           | ON l.event_type = r.event_type""".stripMargin)
      val got = df.collect()
      assert(got.nonEmpty)
      assert(shuffles(df.queryExecution.executedPlan).isEmpty,
        s"catalog SQL join must be exchange-free under SPJ:\n${df.queryExecution.executedPlan}")
    }
  }

  test("SQL graft_asof over two catalog tables plans coLocated, zero exchanges/sorts") {
    // the SQL face of the co-located as-of: the TVF's unresolved
    // children resolve through the graft CATALOG, and the strategy's
    // co-location proof (ordered keyed scans, identical live key sets)
    // must hold from pure SQL exactly as it does from the Scala API
    val root = Files.createTempDirectory("graft_asof_cat").toString
    val cat = "graftasofcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
    Tables.events(spark, TestSpark.sf001)
      .groupBy("event_type", "ts")
      .agg(sum(floor(col("value"))).as("v"))
      .createOrReplaceTempView("asof_cat_src")
    spark.sql(s"DROP TABLE IF EXISTS $cat.main.al")
    spark.sql(s"DROP TABLE IF EXISTS $cat.main.ar")
    spark.sql(s"CREATE TABLE $cat.main.al USING graft " +
      "PARTITIONED BY (event_type) AS SELECT * FROM asof_cat_src")
    spark.sql(s"CREATE TABLE $cat.main.ar USING graft " +
      "PARTITIONED BY (event_type) TBLPROPERTIES ('tsCol'='r_ts') AS " +
      "SELECT event_type, ts - INTERVAL 90 SECONDS AS r_ts, v AS r_v " +
      "FROM asof_cat_src")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true") {
      val df = spark.sql(
        s"SELECT * FROM graft_asof('$cat.main.al', '$cat.main.ar', " +
          "'event_type', 'event_type', 'ts', 'r_ts')")
      val rows = df.collect()
      assert(rows.nonEmpty)
      val plan = df.queryExecution.executedPlan
      def asofs(p: SparkPlan): Seq[graft.plans.AsofJoinExec] = p match {
        case a: AdaptiveSparkPlanExec => asofs(a.executedPlan)
        case q: QueryStageExec => asofs(q.plan)
        case e: graft.plans.AsofJoinExec => e +: e.children.flatMap(asofs)
        case other => other.children.flatMap(asofs)
      }
      val execs = asofs(plan)
      assert(execs.nonEmpty, s"SQL graft_asof must plan AsofJoinExec:\n$plan")
      assert(execs.forall(_.coLocated),
        s"catalog-table as-of must prove co-location from SQL:\n$plan")
      assert(shuffles(plan).isEmpty, s"SQL co-located as-of must not shuffle:\n$plan")
      assert(sorts(plan).isEmpty, s"SQL co-located as-of must not sort:\n$plan")
      // correctness vs the default (shuffled + sorted) path
      val defaults = withDefault {
        spark.sql(
          s"SELECT * FROM graft_asof('$cat.main.al', '$cat.main.ar', " +
            "'event_type', 'event_type', 'ts', 'r_ts')").collect()
      }
      assert(rows.map(_.toString).sorted.toSeq ===
        defaults.map(_.toString).sorted.toSeq)
    }
  }

  test("SQL graft_asof over graft_store TVF views plans coLocated — no catalog needed") {
    // the PATH-addressed SQL face: graft_store() now returns the DSv2
    // relation, so the co-location proof holds for warehouse users who
    // never registered a catalog — views over the TVF feed graft_asof
    // the same ordered keyed scans the Scala API builds
    val dedup = Tables.events(spark, TestSpark.sf001)
      .groupBy("event_type", "ts")
      .agg(sum(floor(col("value"))).as("v"))
    val dirL = Files.createTempDirectory("graft_asof_tvf_l").toString
    val dirR = Files.createTempDirectory("graft_asof_tvf_r").toString
    TsStore.write(dedup, dirL, tsCol = "ts", uidCols = Seq("event_type"))
    TsStore.write(
      dedup.select(col("event_type"),
        (col("ts") - expr("INTERVAL 90 SECONDS")).as("r_ts"),
        col("v").as("r_v")),
      dirR, tsCol = "r_ts", uidCols = Seq("event_type"))
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      graft.sources.GraftScan.PreserveGroupingKey -> "true") {
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW asof_tvf_l AS " +
        s"SELECT * FROM graft_store('$dirL')")
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW asof_tvf_r AS " +
        s"SELECT * FROM graft_store('$dirR')")
      val df = spark.sql(
        "SELECT * FROM graft_asof('asof_tvf_l', 'asof_tvf_r', " +
          "'event_type', 'event_type', 'ts', 'r_ts')")
      val rows = df.collect()
      assert(rows.nonEmpty)
      val plan = df.queryExecution.executedPlan
      def asofs(p: SparkPlan): Seq[graft.plans.AsofJoinExec] = p match {
        case a: AdaptiveSparkPlanExec => asofs(a.executedPlan)
        case q: QueryStageExec => asofs(q.plan)
        case e: graft.plans.AsofJoinExec => e +: e.children.flatMap(asofs)
        case other => other.children.flatMap(asofs)
      }
      val execs = asofs(plan)
      assert(execs.nonEmpty, s"TVF graft_asof must plan AsofJoinExec:\n$plan")
      assert(execs.forall(_.coLocated),
        s"TVF as-of must prove co-location from SQL:\n$plan")
      assert(shuffles(plan).isEmpty, s"TVF co-located as-of must not shuffle:\n$plan")
      assert(sorts(plan).isEmpty, s"TVF co-located as-of must not sort:\n$plan")
      // correctness vs the default (shuffled + sorted) path
      val defaults = withDefault {
        spark.sql(
          "SELECT * FROM graft_asof('asof_tvf_l', 'asof_tvf_r', " +
            "'event_type', 'event_type', 'ts', 'r_ts')").collect()
      }
      assert(rows.map(_.toString).sorted.toSeq ===
        defaults.map(_.toString).sorted.toSeq)
    }
  }

  test("data grouping stays OFF by default: bin-packed layout, no key cap") {
    // Spark 4 defaults spark.sql.sources.v2.bucketing.enabled=true, so
    // without graft's own opt-in every scan of a low-cardinality
    // partitioning would cap its parallelism at the live key count —
    // the default layout must stay bin-packed and UNKEYED
    val (dirL, _) = buildStores()
    val df = spark.read.format("graft").load(dirL).select("event_id", "event_type")
    df.collect()
    def scans(p: SparkPlan): Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    val parts = scans(df.queryExecution.executedPlan).flatMap(_.inputPartitions)
    assert(parts.nonEmpty)
    assert(!parts.exists(_.isInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]),
      "default layout must not be key-grouped")
  }
}
