package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftTable, StoreLog, Tables, TsStore}

/** ALTER TABLE ... ALTER COLUMN ... TYPE — metadata-only safe widenings
  * via GraftTable.PhysicalTypeKey: old files keep their narrow parquet
  * type (readers upcast natively), new writes land the declared wide
  * type, internal frames switch to explicit-schema reads, and
  * narrowing / cross-family retypes refuse.
  */
class RetypeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(): (String, String, String) = {
    val root = Files.createTempDirectory("graft_retype").toString
    val cat = s"grt${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
    Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"),
        col("user_id").cast("int").as("uid_i"),
        col("value").cast("float").as("val_f"),
        col("event_type"))
      .createOrReplaceTempView("retype_src")
    spark.sql(s"CREATE TABLE $cat.main.t USING graft " +
      "PARTITIONED BY (event_type) AS SELECT * FROM retype_src")
    (cat, s"$cat.main.t", s"$root/main/t")
  }

  test("widen int->bigint and float->double: metadata-only, old files upcast, inserts land wide") {
    val (_, t, path) = freshTable()
    val vBefore = StoreLog.latest(path).get.version
    val filesBefore = StoreLog.latest(path).get.files.toSet
    spark.sql(s"ALTER TABLE $t ALTER COLUMN uid_i TYPE BIGINT")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN val_f TYPE DOUBLE")
    val snap = StoreLog.latest(path).get
    assert(snap.files.toSet === filesBefore, "widening must move no data file")
    val declared = DataType.fromJson(snap.props(GraftTable.SchemaProp))
      .asInstanceOf[StructType]
    assert(declared("uid_i").dataType === LongType)
    assert(declared("val_f").dataType === DoubleType)
    assert(declared("uid_i").metadata.contains(GraftTable.PhysicalTypeKey))
    // old (narrow) files read back under the wide declared type
    assert(spark.table(t).schema("uid_i").dataType === LongType)
    val wantSum = Tables.events(spark, TestSpark.sf001)
      .agg(sum(col("user_id"))).head().getLong(0)
    assert(spark.sql(s"SELECT sum(uid_i) FROM $t").head().getLong(0) === wantSum)
    // INSERT a value ONLY the wide type can hold; both widths coexist
    spark.sql(s"INSERT INTO $t VALUES " +
      "(900000001, TIMESTAMP'2024-06-01 00:00:00', 5000000000, 1.5, 'widen')")
    val got = spark.sql(
      s"SELECT uid_i, val_f FROM $t WHERE event_id = 900000001").head()
    assert(got.getLong(0) === 5000000000L && got.getDouble(1) === 1.5)
    assert(spark.sql(s"SELECT sum(uid_i) FROM $t").head().getLong(0) ===
      wantSum + 5000000000L)
    // a filter on the widened column still returns the right rows
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE uid_i > 4000000000").head()
      .getLong(0) === 1L)
    // MIN/MAX aggregate pushdown across MIXED widths: int32-era file
    // stats decode into the declared BIGINT (the long stat domain is
    // width-blind), the int64-era INSERT supplies the new max
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.GraftAggScan
    val qm = spark.sql(s"SELECT min(uid_i) AS lo, max(uid_i) AS hi FROM $t")
    assert(qm.queryExecution.executedPlan
        .collect { case b: BatchScanExec => b.scan }
        .exists(_.isInstanceOf[GraftAggScan]),
      "MIN/MAX(widened col) must stay a manifest answer across mixed widths")
    val wantMin = Tables.events(spark, TestSpark.sf001)
      .agg(min(col("user_id"))).head().getLong(0)
    assert(qm.head().getLong(0) === wantMin && qm.head().getLong(1) === 5000000000L)
  }

  test("time travel reads each era's declared type") {
    val (_, t, path) = freshTable()
    val preWiden = StoreLog.latest(path).get.version
    spark.sql(s"ALTER TABLE $t ALTER COLUMN uid_i TYPE BIGINT")
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF $preWiden")
      .schema("uid_i").dataType === IntegerType,
      "the pre-widen era must read its declared INT type")
    assert(spark.table(t).schema("uid_i").dataType === LongType)
    // the era read returns the same values (narrow domain)
    val a = spark.sql(s"SELECT sum(uid_i) FROM $t VERSION AS OF $preWiden")
      .head().getLong(0)
    val b = spark.sql(s"SELECT sum(uid_i) FROM $t").head().getLong(0)
    assert(a === b)
  }

  test("refusals: narrowing, cross-family, ts and partition columns") {
    val (_, t, _) = freshTable()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN uid_i TYPE BIGINT")
    def refuses(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(frag), s"expected '$frag' in: ${e.getMessage}")
    }
    // narrowing dies in Spark's own analyzer (canUpCast gate) before it
    // reaches the catalog — either refusal is correct, both are loud
    refuses(s"ALTER TABLE $t ALTER COLUMN uid_i TYPE INT", "NOT_SUPPORTED_CHANGE_COLUMN")
    // up-castable but not a SAFE widening (string absorbs everything in
    // canUpCast) — the catalog's own gate must refuse
    refuses(s"ALTER TABLE $t ALTER COLUMN val_f TYPE STRING", "safe widenings")
    refuses(s"ALTER TABLE $t ALTER COLUMN ts TYPE STRING", "time column")
    // a STRING partition column has no legal widening, so the analyzer
    // refuses before the catalog; an INT-partitioned table reaches the
    // catalog's own partition-column guard
    refuses(s"ALTER TABLE $t ALTER COLUMN event_type TYPE BINARY",
      "NOT_SUPPORTED_CHANGE_COLUMN")
    val root2 = Files.createTempDirectory("graft_retype2").toString
    val cat2 = s"grtp${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat2.root", root2)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat2.main")
    spark.sql(s"CREATE TABLE $cat2.main.p (ts TIMESTAMP, bucket INT, v DOUBLE) " +
      "USING graft PARTITIONED BY (bucket)")
    refuses(s"ALTER TABLE $cat2.main.p ALTER COLUMN bucket TYPE BIGINT",
      "partition column")
  }

  test("delta dv DML on a widened store records stats in the wide domain; pushdowns stay manifest answers") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.GraftAggScan
    def aggScan(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan }
        .exists(_.isInstanceOf[GraftAggScan])
    val (_, t, path) = freshTable()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN uid_i TYPE BIGINT")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('delete.mode'='dv')")
    // the delta scan upcasts old int32 files to the declared BIGINT; the
    // writer's stat extraction reads the WIDE domain — identical to the
    // manifest file stats' integral-as-long domain, so the merged entry
    // bounds stay comparable
    spark.sql(s"UPDATE $t SET val_f = val_f + 1 " +
      "WHERE event_id % 97 = 5") // sparse mid-range matches
    val snap = StoreLog.latest(path).get
    assert(snap.dvs.nonEmpty)
    assert(snap.dvs.values.forall(e =>
        e.nulls.contains("uid_i") && e.bounds.get("uid_i").forall(_.tag == "i")),
      s"widened-column dv stats must record in the long domain: ${snap.dvs.values}")
    val qc = spark.sql(s"SELECT count(uid_i) AS n FROM $t")
    assert(aggScan(qc), "COUNT(widened col) must stay a manifest answer under delta vectors")
    assert(qc.head().getLong(0) ===
      Tables.events(spark, TestSpark.sf001).count())
  }

  test("rename then widen compose: physical name + physical type anchors coexist") {
    val (_, t, path) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN uid_i TO uid_code")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN uid_code TYPE BIGINT")
    val declared = DataType.fromJson(
      StoreLog.latest(path).get.props(GraftTable.SchemaProp))
      .asInstanceOf[StructType]
    assert(GraftTable.physicalName(declared("uid_code")) === "uid_i")
    assert(declared("uid_code").dataType === LongType)
    assert(declared("uid_code").metadata.contains(GraftTable.PhysicalTypeKey))
    // old narrow files under the old physical name + a wide insert under
    // the new declared name all read as ONE column
    spark.sql(s"INSERT INTO $t VALUES " +
      "(900000005, TIMESTAMP'2024-06-03 00:00:00', 8000000000, 3.5, 'purchase')")
    val wantSum = Tables.events(spark, TestSpark.sf001)
      .agg(sum(col("user_id"))).head().getLong(0) + 8000000000L
    assert(spark.sql(s"SELECT sum(uid_code) FROM $t").head().getLong(0) === wantSum)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE uid_code > 7000000000")
      .head().getLong(0) === 1L)
  }

  test("tinyint/smallint chain and decimal precision growth across parquet physical widths") {
    // the gate admits byte/short chains and same-scale decimal precision
    // growth; this pins the promotions the flagship test doesn't reach —
    // including decimal growth that CROSSES parquet physical encodings
    // (precision <=9 = INT32, <=18 = INT64, >18 = FIXED_LEN_BYTE_ARRAY
    // under Spark's non-legacy writer), where the reader must upcast
    // across different physical column types, not just reinterpret widths
    val root = Files.createTempDirectory("graft_retype_w").toString
    val cat = s"grtw${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
    val t = s"$cat.main.w"
    spark.sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, b TINYINT, " +
      "d DECIMAL(9,2), part STRING) USING graft PARTITIONED BY (part)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(1, TIMESTAMP'2024-01-01 00:00:00', 7, 123.25, 'a'), " +
      "(2, TIMESTAMP'2024-01-01 00:01:00', -3, 9999999.50, 'a')")
    // byte -> short -> int -> long, an era file at every width
    spark.sql(s"ALTER TABLE $t ALTER COLUMN b TYPE SMALLINT")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(3, TIMESTAMP'2024-01-02 00:00:00', 300, 1.00, 'a')")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN b TYPE INT")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(4, TIMESTAMP'2024-01-03 00:00:00', 100000, 2.00, 'a')")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN b TYPE BIGINT")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(5, TIMESTAMP'2024-01-04 00:00:00', 5000000000, 3.00, 'a')")
    assert(spark.table(t).schema("b").dataType === LongType)
    assert(spark.sql(s"SELECT sum(b) FROM $t").head().getLong(0) ===
      7L - 3L + 300L + 100000L + 5000000000L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE b > 200").head()
      .getLong(0) === 3L)
    // decimal: INT32-backed (9,2) -> INT64-backed (18,2) -> FLBA (20,2)
    spark.sql(s"ALTER TABLE $t ALTER COLUMN d TYPE DECIMAL(18,2)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(6, TIMESTAMP'2024-01-05 00:00:00', 1, 12345678901.25, 'a')")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN d TYPE DECIMAL(20,2)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(7, TIMESTAMP'2024-01-06 00:00:00', 1, 123456789012345678.25, 'a')")
    assert(spark.table(t).schema("d").dataType === DecimalType(20, 2))
    val want = BigDecimal("123.25") + BigDecimal("9999999.50") +
      BigDecimal("1.00") + BigDecimal("2.00") + BigDecimal("3.00") +
      BigDecimal("12345678901.25") + BigDecimal("123456789012345678.25")
    assert(BigDecimal(spark.sql(s"SELECT sum(d) FROM $t").head()
      .getDecimal(0)) === want)
    // per-era values survive the width stack exactly
    assert(BigDecimal(spark.sql(s"SELECT d FROM $t WHERE id = 2").head()
      .getDecimal(0)) === BigDecimal("9999999.50"))
    assert(BigDecimal(spark.sql(s"SELECT d FROM $t WHERE id = 6").head()
      .getDecimal(0)) === BigDecimal("12345678901.25"))
    // scale change is NOT a safe widening, whatever canUpCast thinks
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN d TYPE DECIMAL(22,4)"))
    assert(e.getMessage.contains("safe widenings") ||
      e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
  }

  test("internal verbs ride the explicit-schema read on a widened store") {
    val (_, t, path) = freshTable()
    spark.sql(s"ALTER TABLE $t ALTER COLUMN uid_i TYPE BIGINT")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(900000003, TIMESTAMP'2024-06-02 00:00:00', 6000000000, 2.5, 'purchase')")
    // the store now mixes int32 and int64 files in one partition —
    // mergeSchema would refuse; the typed read must carry every verb
    val before = spark.table(t).count()
    // upsert (Scala path, wide frame)
    val delta = spark.sql(s"SELECT * FROM $t WHERE event_id = 900000003")
      .withColumn("uid_i", lit(7000000000L))
    TsStore.upsert(spark, path, delta, keyCols = Seq("event_id"),
      versionCol = "event_id", tsCol = "ts", uidCols = Seq("event_type"))
    assert(spark.table(t).count() === before)
    assert(spark.sql(s"SELECT uid_i FROM $t WHERE event_id = 900000003")
      .head().getLong(0) === 7000000000L)
    // dv delete + read-under-vector on the mixed-width store
    TsStore.deleteVectors(spark, path, col("event_id") % 11 === 0)
    val live = spark.table(t).count()
    assert(live < before && live > 0)
    // compaction materializes across widths and lands ONE wide schema
    TsStore.compactPartitions(spark, path,
      StoreLog.latest(path).get.files.map(f => f.substring(0, f.lastIndexOf('/')))
        .distinct, tsCol = "ts", uidCols = Seq("event_type"))
    assert(spark.table(t).count() === live)
    assert(StoreLog.latest(path).get.dvs.isEmpty)
    assert(spark.sql(s"SELECT uid_i FROM $t WHERE event_id = 900000003")
      .head().getLong(0) === 7000000000L)
  }
}
