package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Manifest-level KEY DIGESTS — the scattered-takedown accelerant: for
  * a store's declared bloom columns, every committed file records the
  * base64 fingerprint set of its distinct values (derived from the
  * parquet DICTIONARY pages the committing writer's footer pass already
  * holds — no data pages, no extra scan), and the keyed delete verbs
  * ([[TsStore.deleteKeysVectors]] / [[TsStore.deleteKeys]]) probe it at
  * the MANIFEST level: a key set uncorrelated with the (uid, ts) layout
  * passes the [min,max] extent gate on every file, but a digest-carrying
  * file joins the find scan only if it may actually hold a key — so a
  * GDPR-shaped takedown against a million-file store opens footers for
  * O(the keys' files), not O(store). Conservative everywhere: absent
  * digest, saturated dictionary (> [[FileStats.DigestMaxValues]]
  * distinct), tag mismatch, or an over-cap probe set all KEEP files.
  */
class KeyDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One-partition store whose key column `k` defeats extent pruning by
    * construction: every file holds the global lo/hi sentinels (so each
    * file's recorded [min,max] spans every key) plus ONE private value
    * `1000000 + perm(block)` — only the digest can tell files apart.
    * 40 files of 1000 rows, ts-sorted, so block i = rows [1000i, 1000i+999].
    */
  private def permOf(i: Long): Long = (i * 17L) % 40L

  private def scatteredStore(bloom: Boolean): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_keydigest").toString
    val rows = (0L until 40000L).map { r =>
      val block = r / 1000L
      val k =
        if (r % 3 == 0) 0L
        else if (r % 3 == 1) 2000000L
        else 1000000L + permOf(block)
      ("all", r, k, 1L, r.toDouble)
    }.toDF("p", "ts", "k", "version", "v")
    TsStore.write(rows, dir, tsCol = "ts", uidCols = Seq("p"),
      maxRecordsPerFile = 1000L,
      bloomKeys = if (bloom) Seq("k") else Nil)
    dir
  }

  test("declared bloom columns record dictionary-derived digests; undeclared do not") {
    val dir = scatteredStore(bloom = true)
    val snap = StoreLog.latest(dir).get
    assert(snap.files.size === 40)
    snap.files.foreach { f =>
      val cs = snap.stats(f)("k")
      assert(cs.digest != null, s"$f lacks a k digest")
      // 3 distinct values per file → 3 fingerprints → 16 base64 bytes
      assert(java.util.Base64.getDecoder.decode(cs.digest).length === 12)
      // undeclared columns carry no digest
      assert(snap.stats(f).get("ts").forall(_.digest == null))
    }
    val plain = scatteredStore(bloom = false)
    val psnap = StoreLog.latest(plain).get
    assert(psnap.files.forall(f => psnap.stats(f).get("k").forall(_.digest == null)))
  }

  test("digest JSON round-trips through delta and checkpoint containers") {
    val m = Map("k" -> FileStats.ColStat("i", 0L, 9L, 0L, 10L,
      FileStats.digestEncode({
        val t = new java.util.TreeSet[Integer]()
        t.add(7); t.add(-3); t.add(42); t
      })))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val back = FileStats.fromJson(FileStats.toJson(mapper, m))
    assert(back === m)
    // unknown-count stats still carry the digest (−1 placeholders)
    val m2 = Map("k" -> FileStats.ColStat("s", "a", "z", -1L, -1L,
      m("k").digest))
    assert(FileStats.fromJson(FileStats.toJson(mapper, m2)) === m2)
    // legacy entries (no 6th element) parse digest-less
    assert(FileStats.fromJson(FileStats.toJson(mapper,
      Map("k" -> FileStats.ColStat("i", 0L, 9L, 0L, 10L))))("k").digest == null)
  }

  test("scattered dv takedown probes digests: candidates ≪ live files, result exact") {
    import spark.implicits._
    val dir = scatteredStore(bloom = true)
    // one scattered key, private to block 7 — extent keeps all 40
    // files (every file spans [0, 2000000]), the digest keeps ~1
    val key = 1000000L + permOf(7L)
    val before = TsStore.load(spark, dir).filter(col("k") === key).count()
    assert(before === 333L) // block 7's r%3==2 rows
    TsStore.lastTakedownCandidates = -1
    val v = TsStore.deleteKeysVectors(spark, dir,
      Seq((key, 5L)).toDF("k", "del_v"),
      keyCols = Seq("k"), deleteVersionCol = "del_v", versionCol = "version")
    assert(v > 0)
    assert(TsStore.lastTakedownCandidates === 1,
      s"digest gate kept ${TsStore.lastTakedownCandidates} of 40 files")
    val after = TsStore.load(spark, dir)
    assert(after.filter(col("k") === key).count() === 0L)
    assert(after.count() === 40000L - 333L)
    // the cow twin prunes the same way
    val dir2 = scatteredStore(bloom = true)
    TsStore.lastTakedownCandidates = -1
    TsStore.deleteKeys(spark, dir2, Seq((key, 5L)).toDF("k", "del_v"),
      keyCols = Seq("k"), deleteVersionCol = "del_v", versionCol = "version",
      tsCol = "ts", uidCols = Seq("p"))
    assert(TsStore.lastTakedownCandidates === 1)
    assert(TsStore.load(spark, dir2).count() === 40000L - 333L)
  }

  test("composite keys probe every digestable column; timestamp keys probe as micros") {
    import spark.implicits._
    // composite (coarse, fine): the coarse first column holds the SAME
    // four values in every file, so a first-column-only probe keeps all
    // 40 — only the FINE column's digest can prune the takedown
    val dir = Files.createTempDirectory("graft_keydigest_comp").toString
    val rows = (0L until 40000L).map { r =>
      val block = r / 1000L
      val k =
        if (r % 3 == 0) 0L
        else if (r % 3 == 1) 2000000L
        else 1000000L + permOf(block)
      ("all", r, r % 4L, k, 1L, r.toDouble)
    }.toDF("p", "ts", "g", "k", "version", "v")
    TsStore.write(rows, dir, tsCol = "ts", uidCols = Seq("p"),
      maxRecordsPerFile = 1000L, bloomKeys = Seq("g", "k"))
    val key = 1000000L + permOf(7L)
    val expectDel = TsStore.load(spark, dir)
      .filter(col("g") === 2L && col("k") === key).count()
    assert(expectDel > 0)
    TsStore.lastTakedownCandidates = -1
    TsStore.deleteKeysVectors(spark, dir,
      Seq((2L, key, 5L)).toDF("g", "k", "del_v"),
      keyCols = Seq("g", "k"), deleteVersionCol = "del_v",
      versionCol = "version")
    assert(TsStore.lastTakedownCandidates === 1,
      s"the fine column's digest must prune a composite takedown: " +
        s"${TsStore.lastTakedownCandidates} of 40 files")
    assert(TsStore.load(spark, dir).count() === 40000L - expectDel)
    // timestamp key domain: the file side records micros-integral
    // fingerprints off the INT64 dictionary; the probe hashes the
    // java.sql.Timestamp key through the same micros domain
    val tdir = Files.createTempDirectory("graft_keydigest_ts").toString
    val trows = (0L until 40000L).map { r =>
      val block = r / 1000L
      val k =
        if (r % 3 == 0) 0L
        else if (r % 3 == 1) 2000000L
        else 1000000L + permOf(block)
      ("all", r, k, 1L)
    }.toDF("p", "ts", "k", "version")
      .withColumn("at", col("k").cast("timestamp"))
    TsStore.write(trows, tdir, tsCol = "ts", uidCols = Seq("p"),
      maxRecordsPerFile = 1000L, bloomKeys = Seq("at"))
    val tsnap = StoreLog.latest(tdir).get
    assert(tsnap.files.forall(f => tsnap.stats(f).get("at")
      .exists(cs => cs.tag == "ts" && cs.digest != null)),
      "timestamp bloom columns must record micros digests")
    TsStore.lastTakedownCandidates = -1
    TsStore.deleteKeysVectors(spark, tdir,
      Seq((new java.sql.Timestamp(key * 1000L), 5L)).toDF("at", "del_v"),
      keyCols = Seq("at"), deleteVersionCol = "del_v", versionCol = "version")
    assert(TsStore.lastTakedownCandidates === 1,
      s"a timestamp-keyed scattered takedown must digest-prune: " +
        s"${TsStore.lastTakedownCandidates} of 40 files")
    assert(TsStore.load(spark, tdir).count() === 40000L - 333L)
  }

  test("conservative keeps: no digest, saturated dictionary, absent key") {
    import spark.implicits._
    // no declared bloom cols → no digests → every file stays a candidate
    val plain = scatteredStore(bloom = false)
    val key = 1000000L + permOf(7L)
    TsStore.lastTakedownCandidates = -1
    TsStore.deleteKeysVectors(spark, plain, Seq((key, 5L)).toDF("k", "del_v"),
      keyCols = Seq("k"), deleteVersionCol = "del_v", versionCol = "version")
    assert(TsStore.lastTakedownCandidates === 40)
    assert(TsStore.load(spark, plain).count() === 40000L - 333L)
    // a key in NO file prunes everything (zero candidates, no-op commit)
    val dir = scatteredStore(bloom = true)
    val v0 = StoreLog.latestVersion(dir).get
    assert(TsStore.deleteKeysVectors(spark, dir,
      Seq((555L, 5L)).toDF("k", "del_v"),
      keyCols = Seq("k"), deleteVersionCol = "del_v",
      versionCol = "version") === v0)
    assert(TsStore.lastTakedownCandidates === 0)
    // saturation: > DigestMaxValues distinct per file → digest dropped,
    // file conservatively kept
    val sat = Files.createTempDirectory("graft_keydigest_sat").toString
    val satRows = (0L until 10000L).map(r => ("all", r, r, 1L))
      .toDF("p", "ts", "k", "version")
    TsStore.write(satRows, sat, tsCol = "ts", uidCols = Seq("p"),
      maxRecordsPerFile = 8000L, bloomKeys = Seq("k"))
    val ssnap = StoreLog.latest(sat).get
    assert(ssnap.files.exists(f => ssnap.stats(f).get("k")
      .exists(cs => cs.rows >= 8000L && cs.digest == null)),
      "an over-cap dictionary must record NO digest")
  }
}
