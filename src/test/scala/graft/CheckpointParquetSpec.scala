package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CheckpointParquet, Dv, FileStats, StoreLog, Tables, TsStore}

/** Columnar (parquet) checkpoint manifests — the million-file-store fix:
  * past [[StoreLog.ParquetCheckpointThreshold]] live files, a checkpoint's
  * JSON shrinks to an O(1) pointer and the live list + per-file
  * stats/sizes/dvs ride a compressed parquet sidecar. Pins: codec
  * round-trip fidelity, the bounded-manifest contract at 100k files,
  * delta resolution above a parquet checkpoint, CAS-loser sidecar
  * cleanup, vacuum's pointer-aware rewrite + orphan reclaim, and an
  * end-to-end store lifecycle with EVERY checkpoint forced columnar.
  */
class CheckpointParquetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withThreshold[T](n: Int)(body: => T): T = {
    val old = StoreLog.ParquetCheckpointThreshold
    StoreLog.ParquetCheckpointThreshold = n
    try body finally StoreLog.ParquetCheckpointThreshold = old
  }

  private def logFiles(dir: String): Seq[String] =
    Files.list(Paths.get(StoreLog.logDir(dir))).toArray.toSeq
      .map(_.toString.split('/').last)

  // ------------------------------------------------------------- codec

  test("payload codec round-trips every stat tag, sizes, and dv shapes") {
    val files = Seq("a=1/f1.parquet", "a=1/f2.parquet", "a=2/f3.parquet")
    val stats = Map(
      "a=1/f1.parquet" -> Map(
        "i" -> FileStats.ColStat("i", 3L, 99L, 0L, 50L),
        "f" -> FileStats.ColStat("f", -1.5, 2.25, 2L, 50L),
        "s" -> FileStats.ColStat("s", "alpha", "omega", -1L, -1L),
        "t" -> FileStats.ColStat("ts", 1000000L, 2000000L, 0L, 50L),
        "n" -> FileStats.ColStat("tn", 5L, 6L, 1L, 50L),
        "d" -> FileStats.ColStat("d", 19000L, 19365L, 0L, 50L)),
      // legacy 3-element stats (unknown nulls/rows) survive the trip
      "a=2/f3.parquet" -> Map("i" -> FileStats.ColStat("i", 1L, 2L)))
    val sizes = Map("a=1/f1.parquet" -> 12345L, "a=2/f3.parquet" -> 99L)
    val dvs = Map(
      "a=1/f2.parquet" -> Dv.Entry("_graft_dv/x.gdv", 7L,
        nulls = Map("u" -> 2L, "v" -> 0L),
        bounds = Map("u" -> Dv.Bound("i", Some(10L), Some(20L)),
          "s" -> Dv.Bound("s", Some("aa"), Some("zz")),
          "w" -> Dv.Bound.empty("i"))),
      "a=2/f3.parquet" -> Dv.Entry("_graft_dv/y.gdv", 1L))
    val bytes = CheckpointParquet.write(files, stats, sizes, dvs)
    val (f2, s2, z2, d2) = CheckpointParquet.read(bytes)
    assert(f2 === files.sorted)
    assert(s2 === stats)
    assert(z2 === sizes)
    assert(d2 === dvs)
  }

  // ------------------------------------- bounded manifests at 100k files

  test("100k-file checkpoint: O(1) JSON manifest, full resolution, deltas above it") {
    withThreshold(1000) {
      val dir = Files.createTempDirectory("graft_ckpt_100k").toString
      val n = 100000
      val files = (0 until n).map(i => f"p=${i % 64}/part-$i%06d.parquet")
      val stats = files.iterator.zipWithIndex.map { case (f, i) =>
        f -> Map("ts" -> FileStats.ColStat("ts", i * 1000L, i * 1000L + 999L, 0L, 100L),
          "k" -> FileStats.ColStat("i", i.toLong, i.toLong + 10L, 0L, 100L))
      }.toMap
      val sizes = files.iterator.zipWithIndex.map { case (f, i) =>
        f -> (1000L + i)
      }.toMap
      // v1: the synthetic 100k-file checkpoint (no data files needed —
      // StoreLog never opens them; FileStats came in precomputed)
      val v1 = StoreLog.commit(dir, 0L, Seq.empty, files,
        addStats = stats, addSizes = sizes)
      assert(v1 === 1L)
      // the JSON manifest is a POINTER: bounded bytes however many files
      val vjson = Paths.get(StoreLog.logDir(dir), "v00000001.json")
      assert(Files.size(vjson) < 2048,
        s"pointer manifest must be O(1), got ${Files.size(vjson)} bytes")
      assert(logFiles(dir).exists(_.endsWith(".ckpt.parquet")))
      // resolution: all files, all stats, all sizes — through the API
      val snap = StoreLog.read(dir, v1)
      assert(snap.files.size === n)
      assert(snap.files === files.sorted)
      assert(snap.stats.size === n)
      assert(snap.stats("p=0/part-000000.parquet")("k") ===
        FileStats.ColStat("i", 0L, 10L, 0L, 100L))
      assert(snap.sizes("p=31/part-099999.parquet") === 1000L + 99999L)
      // deltas resolve FORWARD over the parquet base
      val v2 = StoreLog.commit(dir, v1, Seq("p=0"),
        snap.files.filterNot(_ === "p=0/part-000000.parquet") :+ "p=0/part-new.parquet",
        parent = Some(snap),
        addStats = Map("p=0/part-new.parquet" ->
          Map("k" -> FileStats.ColStat("i", -5L, -1L, 0L, 7L))))
      val s2 = StoreLog.read(dir, v2)
      assert(s2.files.size === n)
      assert(s2.files.contains("p=0/part-new.parquet"))
      assert(!s2.files.contains("p=0/part-000000.parquet"))
      assert(!s2.stats.contains("p=0/part-000000.parquet"))
      assert(s2.stats("p=0/part-new.parquet")("k").min === -5L)
      // the delta itself stayed O(commit): small JSON, no new sidecar
      assert(Files.size(Paths.get(StoreLog.logDir(dir), "v00000002.json")) < 2048)
      assert(logFiles(dir).count(_.endsWith(".ckpt.parquet")) === 1)
      // time travel back to the checkpoint version still exact
      assert(StoreLog.read(dir, v1).files.size === n)
      // and the payload is dramatically smaller than the JSON it replaces
      val sidecar = logFiles(dir).find(_.endsWith(".ckpt.parquet")).get
      val pq = Files.size(Paths.get(StoreLog.logDir(dir), sidecar))
      withThreshold(Int.MaxValue) {
        val dirJ = Files.createTempDirectory("graft_ckpt_json").toString
        StoreLog.commit(dirJ, 0L, Seq.empty, files, addStats = stats,
          addSizes = sizes)
        val js = Files.size(Paths.get(StoreLog.logDir(dirJ), "v00000001.json"))
        assert(pq * 4 < js,
          s"parquet payload ($pq B) should be far under the JSON form ($js B)")
      }
    }
  }

  test("CAS loser deletes its staged sidecar") {
    withThreshold(1) {
      val dir = Files.createTempDirectory("graft_ckpt_cas").toString
      val files = Seq("p=1/a.parquet", "p=1/b.parquet")
      StoreLog.commit(dir, 0L, Seq.empty, files)
      assert(logFiles(dir).count(_.endsWith(".ckpt.parquet")) === 1)
      // both "writers" race version 2 from the same parent; with
      // interval 10, v2 is a delta — force checkpoints via resetDvs-free
      // fresh log at interval 1 instead
      val dir2 = Files.createTempDirectory("graft_ckpt_cas2").toString
      StoreLog.commit(dir2, 0L, Seq.empty, files, interval = Some(1))
      val base = StoreLog.read(dir2, 1L)
      StoreLog.commit(dir2, 1L, Seq.empty, files :+ "p=1/c.parquet", parent = Some(base))
      val before = logFiles(dir2).count(_.endsWith(".ckpt.parquet"))
      intercept[StoreLog.CommitConflict] {
        StoreLog.commit(dir2, 1L, Seq.empty, files :+ "p=1/d.parquet", parent = Some(base))
      }
      assert(logFiles(dir2).count(_.endsWith(".ckpt.parquet")) === before,
        "the CAS loser must delete its orphaned sidecar")
    }
  }

  test("vacuum: delta rewritten as pointer checkpoint; dropped/orphaned sidecars reclaimed") {
    withThreshold(1) {
      val dir = Files.createTempDirectory("graft_ckpt_vac").toString
      val mk = (i: Int) => s"p=1/f$i.parquet"
      // interval 3: v1 ckpt, v2-v3 deltas, v4 ckpt (hmm: v3 % 3 == 0 → v3 ckpt)
      var snap = {
        StoreLog.commit(dir, 0L, Seq.empty, Seq(mk(1)), interval = Some(3))
        StoreLog.read(dir, 1L)
      }
      (2 to 5).foreach { i =>
        StoreLog.commit(dir, snap.version, Seq("p=1"), snap.files :+ mk(i),
          parent = Some(snap))
        snap = StoreLog.read(dir, i.toLong)
      }
      // v1 ckpt(parquet), v2 delta, v3 ckpt(parquet), v4 delta, v5 delta
      assert(logFiles(dir).count(_.endsWith(".ckpt.parquet")) === 2)
      // plant data files so vacuum's walk sees them (zero-byte is fine —
      // they are never opened)
      (1 to 5).foreach { i =>
        val p = Paths.get(dir, mk(i))
        Files.createDirectories(p.getParent); Files.write(p, Array[Byte]())
      }
      // plant an AGED orphan sidecar (a crashed CAS loser)
      val orphan = Paths.get(StoreLog.logDir(dir), "v00000009-dead.ckpt.parquet")
      Files.write(orphan, CheckpointParquet.write(Seq("x.parquet"), Map.empty,
        Map.empty, Map.empty))
      Files.setLastModifiedTime(orphan, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - 2 * StoreLog.WriterLeaseMs))
      // retain 2: keeps v4 (a DELTA — must be rewritten self-contained) + v5
      StoreLog.vacuum(dir, retainVersions = 2)
      val names = logFiles(dir)
      assert(!names.contains("v00000009-dead.ckpt.parquet"),
        "aged unreferenced sidecar must be reclaimed")
      // v4 was rewritten as a checkpoint — as a POINTER (threshold 1)
      val v4 = StoreLog.read(dir, 4L)
      assert(v4.files === (1 to 4).map(mk).sorted)
      val v4Sidecars = names.filter(_.startsWith("v00000004-"))
      assert(v4Sidecars.nonEmpty, "the rewrite should stage a parquet payload")
      // v3's sidecar (version dropped) is unreferenced — but YOUNG, so it
      // survives this pass (crash insurance) and reclaims once aged
      val v3Side = names.filter(_.startsWith("v00000003-"))
      assert(v3Side.nonEmpty)
      v3Side.foreach { s =>
        Files.setLastModifiedTime(Paths.get(StoreLog.logDir(dir), s),
          java.nio.file.attribute.FileTime
            .fromMillis(System.currentTimeMillis() - 2 * StoreLog.WriterLeaseMs))
      }
      StoreLog.vacuum(dir, retainVersions = 2)
      assert(!logFiles(dir).exists(_.startsWith("v00000003-")),
        "a dropped version's sidecar must reclaim once aged")
      // v5 still resolves over the rewritten v4
      assert(StoreLog.read(dir, 5L).files === (1 to 5).map(mk).sorted)
    }
  }

  // --------------------------------------- end-to-end store lifecycle

  test("store lifecycle with every checkpoint columnar: upsert, dv delete, time travel, restore, vacuum") {
    withThreshold(1) {
      val dir = Files.createTempDirectory("graft_ckpt_life").toString
      val events = Tables.events(spark, TestSpark.sf001)
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      val base = events.select(cols.map(col) :+ lit(1L).as("version"): _*)
      TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
      StoreLog.ensure(dir)
      val n0 = TsStore.read(spark, dir).count()
      assert(n0 === events.count())
      assert(logFiles(dir).exists(_.endsWith(".ckpt.parquet")),
        "the adoption checkpoint must be columnar at threshold 1")
      // the adoption commit's stats survived the parquet trip: countAt
      // is a manifest answer
      assert(TsStore.countAt(dir) === Some(n0))
      val v1 = StoreLog.latestVersion(dir).get
      // upsert (delta commit over the parquet checkpoint)
      val delta = events.filter(col("event_id") % 7 === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          (col("value") + 100).as("value"), lit(2L).as("version"))
      TsStore.upsert(spark, dir, delta, keyCols = Seq("event_id"),
        versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
      assert(TsStore.read(spark, dir).count() === n0)
      assert(TsStore.read(spark, dir).filter(col("version") === 2L).count() ===
        delta.count())
      // dv delete rides the same manifests
      val vDel = TsStore.deleteVectors(spark, dir, col("event_id") % 13 === 0)
      val live = TsStore.read(spark, dir).count()
      assert(live < n0)
      assert(TsStore.countAt(dir) === Some(live))
      // force a parquet checkpoint CARRYING dv entries (commit enough
      // versions to cross the interval boundary), then resolve through it
      val snapD = StoreLog.latest(dir).get
      assert(snapD.dvs.nonEmpty)
      var s = snapD
      while (StoreLog.latestVersion(dir).get % s.checkpointInterval != 0) {
        StoreLog.commit(dir, s.version, Seq.empty, s.files, parent = Some(s))
        s = StoreLog.latest(dir).get
      }
      assert(s.dvs === snapD.dvs, "dv entries must survive the columnar checkpoint")
      assert(TsStore.read(spark, dir).count() === live)
      // time travel to the pre-delete version
      assert(TsStore.read(spark, dir, asOf = Some(vDel - 1)).count() === n0)
      // restore (resetDvs forces a checkpoint — columnar here)
      TsStore.restore(spark, dir, v1)
      assert(TsStore.read(spark, dir).count() === n0)
      assert(TsStore.read(spark, dir).filter(col("version") === 2L).count() === 0)
      // vacuum keeps the store resolvable and reclaims history
      TsStore.vacuum(dir, retainVersions = 1)
      assert(TsStore.read(spark, dir).count() === n0)
    }
  }
}
