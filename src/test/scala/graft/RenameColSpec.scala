package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftTable, StoreLog, Tables}

/** ALTER TABLE RENAME COLUMN via COLUMN MAPPING (GraftTable.PhysicalKey):
  * metadata-only renames — the column keeps its original parquet name,
  * reads/writes/filters/aggregates translate at the DSv2 face, and time
  * travel reads each era's declared name.
  */
class RenameColSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(): (String, String) = {
    val root = Files.createTempDirectory("graft_rencol").toString
    val cat = s"grc${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
    Tables.events(spark, TestSpark.sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("rencol_src")
    spark.sql(s"CREATE TABLE $cat.main.t USING graft " +
      "PARTITIONED BY (event_type) AS SELECT * FROM rencol_src")
    (cat, s"$cat.main.t")
  }

  test("rename is metadata-only; reads, filters and inserts translate") {
    val (cat, t) = freshTable()
    val before = spark.table(t).count()
    val filesBefore = {
      val path = spark.conf.get(s"spark.sql.catalog.$cat.root") + "/main/t"
      StoreLog.latest(path).get.files.toSet
    }
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    val path = spark.conf.get(s"spark.sql.catalog.$cat.root") + "/main/t"
    val snap = StoreLog.latest(path).get
    assert(snap.files.toSet === filesBefore, "rename must move no data file")
    // declared schema carries the new name, anchored to the old physical
    val declared = org.apache.spark.sql.types.DataType
      .fromJson(snap.props(GraftTable.SchemaProp))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(declared.fieldNames.contains("amount"))
    assert(!declared.fieldNames.contains("value"))
    assert(GraftTable.physicalName(declared("amount")) === "value")
    // full read under the new name matches the old data
    assert(spark.table(t).count() === before)
    val sumOld = Tables.events(spark, TestSpark.sf001)
      .agg(sum(floor(col("value")))).head().getLong(0)
    assert(spark.sql(s"SELECT sum(floor(amount)) FROM $t").head().getLong(0) === sumOld)
    // a data filter on the renamed column translates (row-group skips
    // included) and returns the right rows
    val wantPos = Tables.events(spark, TestSpark.sf001)
      .filter(col("value") > 0).count()
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE amount > 0").head().getLong(0)
      === wantPos)
    // aggregate pushdown answers from re-keyed stats
    val wantMax = Tables.events(spark, TestSpark.sf001)
      .agg(max(col("event_id"))).head().getLong(0)
    assert(spark.sql(s"SELECT max(event_id) FROM $t").head().getLong(0) === wantMax)
    // INSERT after the rename: new files land under the PHYSICAL name
    spark.sql(s"INSERT INTO $t SELECT event_id + 1000000, ts, user_id, " +
      "event_type, amount * 2 FROM (SELECT event_id, ts, user_id, " +
      "event_type, value AS amount FROM rencol_src LIMIT 10)")
    assert(spark.table(t).count() === before + 10)
    val post = StoreLog.latest(path).get
    val newFiles = post.files.filterNot(filesBefore)
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      val cols = post.stats.get(f).map(_.keySet).getOrElse(Set.empty)
      assert(cols.contains("value") && !cols.contains("amount"),
        s"post-rename file $f must carry the physical column name: $cols")
    }
    // the inserted rows read back under the logical name
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE event_id >= 1000000")
      .head().getLong(0) === 10)
  }

  test("time travel reads each era's declared name") {
    val (_, t) = freshTable()
    val preV = spark.sql(s"CALL ${t.split('.').head}.system.history(table => 'main.t')")
      .agg(max(col("version"))).head().getLong(0)
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    assert(spark.table(t).schema.fieldNames.contains("amount"))
    val pre = spark.sql(s"SELECT * FROM $t VERSION AS OF $preV")
    assert(pre.schema.fieldNames.contains("value") &&
      !pre.schema.fieldNames.contains("amount"),
      "the pre-rename era must read under its own declared name")
    assert(pre.agg(sum(floor(col("value")))).head().getLong(0) ===
      spark.sql(s"SELECT sum(floor(amount)) FROM $t").head().getLong(0))
  }

  test("DELETE on a renamed column translates the predicate") {
    val (_, t) = freshTable()
    val before = spark.table(t).count()
    val matching = spark.sql(s"SELECT count(*) FROM $t WHERE event_id % 7 = 0")
      .head().getLong(0)
    spark.sql(s"ALTER TABLE $t RENAME COLUMN event_id TO eid")
    spark.sql(s"DELETE FROM $t WHERE eid % 7 = 0")
    assert(spark.table(t).count() === before - matching)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE eid % 7 = 0")
      .head().getLong(0) === 0)
  }

  test("rename back restores the identity mapping") {
    val (_, t) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN amount TO value")
    val path = {
      val cat = t.split('.').head
      spark.conf.get(s"spark.sql.catalog.$cat.root") + "/main/t"
    }
    val declared = org.apache.spark.sql.types.DataType
      .fromJson(StoreLog.latest(path).get.props(GraftTable.SchemaProp))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(GraftTable.physicalName(declared("value")) === "value",
      "renaming back must drop the mapping, not stack a second one")
    assert(spark.table(t).filter(col("value") > 0).count() ===
      Tables.events(spark, TestSpark.sf001).filter(col("value") > 0).count())
  }

  test("refusals: ts column, partition column, existing and tombstoned names") {
    val (_, t) = freshTable()
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN ts TO t2"))
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN event_type TO et"))
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO user_id"))
    spark.sql(s"ALTER TABLE $t DROP COLUMN user_id")
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO user_id"))
    // dropping a RENAMED column tombstones its physical name too
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    spark.sql(s"ALTER TABLE $t DROP COLUMN amount")
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMN value DOUBLE"))
  }

  test("ADD COLUMN refuses a live renamed column's physical anchor") {
    val (_, t) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    // 'value' is amount's physical parquet name — old files still carry
    // it; declaring it as a new column would alias two logical columns
    // onto one physical one
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD COLUMN value DOUBLE"))
    assert(e.getMessage.contains("physical anchor"), e.getMessage)
  }

  test("dv DELETE on a renamed column keeps the COUNT pushdown exact under the new name") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.GraftAggScan
    val (cat, t) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('delete.mode'='dv')")
    // the DELETE predicate names the DECLARED column; the vector's
    // per-column stats land under the PHYSICAL parquet name and the
    // snapshot re-keys them back for every pushdown
    spark.sql(s"DELETE FROM $t WHERE amount > 0 AND event_id % 7 = 0")
    val path = spark.conf.get(s"spark.sql.catalog.$cat.root") + "/main/t"
    val snap = StoreLog.latest(path).get
    assert(snap.dvs.nonEmpty, "delete.mode=dv must route through vectors")
    assert(snap.dvs.values.forall(_.nulls.contains("value")),
      "dv stats are recorded under the physical name")
    val q = spark.sql(s"SELECT count(amount) AS n FROM $t")
    val pushed = q.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b.scan }
      .exists(_.isInstanceOf[GraftAggScan])
    assert(pushed,
      s"COUNT(renamed col) under dv stats must stay a manifest answer:\n" +
        q.queryExecution.executedPlan)
    val want = Tables.events(spark, TestSpark.sf001)
      .filter(!(col("value") > 0 && col("event_id") % 7 === 0))
      .agg(count(col("value"))).head().getLong(0)
    assert(q.head().getLong(0) === want)
  }

  test("delta UPDATE on a renamed store records dv stats under the physical name") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.GraftAggScan
    val (cat, t) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('delete.mode'='dv')")
    // the delta op's metadata attributes resolve the DECLARED name; the
    // fragment stats must land under the PHYSICAL parquet name or every
    // pushdown would refuse (re-key happens at the DSv2 face)
    spark.sql(s"UPDATE $t SET amount = amount + 1 WHERE event_id % 5 = 0")
    val path = spark.conf.get(s"spark.sql.catalog.$cat.root") + "/main/t"
    val snap = StoreLog.latest(path).get
    assert(snap.dvs.nonEmpty, "the UPDATE must have committed vectors")
    assert(snap.dvs.values.forall(e =>
        e.nulls.contains("value") && !e.nulls.contains("amount")),
      s"delta dv stats must key the PHYSICAL name: ${snap.dvs.values.map(_.nulls.keySet)}")
    val q = spark.sql(s"SELECT count(amount) AS n FROM $t")
    val pushed = q.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b.scan }
      .exists(_.isInstanceOf[GraftAggScan])
    assert(pushed,
      s"COUNT(renamed col) under delta-dv stats must stay a manifest answer:\n" +
        q.queryExecution.executedPlan)
    // an UPDATE re-inserts every matched row — the non-null count holds
    assert(q.head().getLong(0) ===
      Tables.events(spark, TestSpark.sf001).agg(count(col("value"))).head().getLong(0))
  }

  test("Scala append and upsert on a renamed store land the physical schema") {
    import graft.sources.TsStore
    val (cat, t) = freshTable()
    val path = spark.conf.get(s"spark.sql.catalog.$cat.root") + "/main/t"
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    val src = Tables.events(spark, TestSpark.sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // APPEND a frame carrying the DECLARED name: the write must
    // translate to the physical parquet name or every appended row
    // reads back NULL under the mapping
    TsStore.write(
      src.select((col("event_id") + 20000000L).as("event_id"), col("ts"),
        col("user_id"), col("event_type"), (col("value") * 3).as("amount")),
      path, tsCol = "ts", uidCols = Seq("event_type"),
      mode = org.apache.spark.sql.SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    val appended = spark.sql(
      s"SELECT count(*) FROM $t WHERE event_id >= 20000000 AND amount IS NOT NULL")
      .head().getLong(0)
    assert(appended === src.count(), "appended rows must read back under the rename")
    // UPSERT a delta carrying the DECLARED name (and addressing keys by it)
    val delta = src.limit(10)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") * 100 + 7).as("amount"))
    TsStore.upsert(spark, path, delta, keyCols = Seq("event_id"),
      versionCol = "event_id", tsCol = "ts", uidCols = Seq("event_type"))
    val ids = delta.select("event_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSeq
    val got = spark.sql(
      s"SELECT event_id, amount FROM $t WHERE event_id IN (${ids.mkString(",")})")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = delta.collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got === want, "upserted rows must read back under the rename")
  }

  test("RENAME refuses a live renamed column's physical anchor") {
    val (_, t) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    // 'value' is now amount's stored physical anchor — renaming another
    // column ONTO it would alias two logical columns over one parquet
    // name ({amount→value, value→score}-shaped corruption on the write
    // translation); the catalog must refuse like ADD COLUMN does
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t RENAME COLUMN user_id TO value")
    }
    assert(e.getMessage.contains("physical anchor"))
    // renaming BACK onto one's own anchor stays legal
    spark.sql(s"ALTER TABLE $t RENAME COLUMN amount TO value")
    assert(spark.table(t).columns.contains("value"))
  }

  test("Scala append translates MULTIPLE renames simultaneously") {
    import graft.sources.TsStore
    val (cat, t) = freshTable()
    val path = spark.conf.get(s"spark.sql.catalog.$cat.root") + "/main/t"
    spark.sql(s"ALTER TABLE $t RENAME COLUMN value TO amount")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN user_id TO uid_code")
    val src = Tables.events(spark, TestSpark.sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    TsStore.write(
      src.select((col("event_id") + 30000000L).as("event_id"), col("ts"),
        (col("user_id") + 5).as("uid_code"), col("event_type"),
        (col("value") * 2).as("amount")),
      path, tsCol = "ts", uidCols = Seq("event_type"),
      mode = org.apache.spark.sql.SaveMode.Append,
      overlapPolicy = TsStore.OverlapPolicy.Allow)
    val bad = spark.sql(
      s"SELECT count(*) FROM $t WHERE event_id >= 30000000 AND " +
        "(amount IS NULL OR uid_code IS NULL)").head().getLong(0)
    assert(bad === 0L, "both renamed columns must land their physical names")
    val n = spark.sql(
      s"SELECT count(*) FROM $t WHERE event_id >= 30000000").head().getLong(0)
    assert(n === src.count())
  }
}
