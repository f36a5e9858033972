package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ArrayNode

/** Versioned file manifest for a TsStore directory — the minimal commit
  * protocol that makes [[TsStore.upsert]] crash-atomic and cross-process
  * safe (the reference has no multi-writer story at all: MongoDB gave it
  * document-level atomicity for free; a parquet directory gives none).
  *
  * Layout: `<store>/_graft_log/v00000001.json`, one JSON file per
  * version. Underscore-prefixed, '='-free name, so Spark's partition
  * discovery never sees it. Every [[CheckpointInterval]]-th version is
  * a CHECKPOINT carrying the full live file list; versions between are
  * DELTAS (add/remove vs their parent), so a commit writes O(its own
  * footprint) and a read resolves at most `interval − 1` deltas above
  * one checkpoint:
  *
  * {{{
  * { "version": 10, "timestampMs": ..., "replaced": ["event_type=view"],
  *   "files": ["event_type=view/part-...parquet", ...] }        // checkpoint
  * { "version": 11, "timestampMs": ..., "replaced": [...],
  *   "add": [...], "remove": [...] }                            // delta
  * }}}
  *
  * Commit is compare-and-swap on the NEXT version's file name: the
  * content is fully written to a hidden temp file, then linked into
  * place with an atomic fail-if-exists primitive (POSIX hard link for
  * `file:` paths; HDFS `rename` is atomic-no-overwrite by contract). Two
  * writers racing to the same version: exactly one wins; the loser sees
  * the winner's snapshot and either rebases (disjoint `replaced`
  * partition sets — both commits serialize cleanly) or aborts. A crash
  * at ANY point before the link leaves the previous version live and
  * intact — readers can never observe a half-committed state, because
  * the only mutation readers look at is the appearance of one file.
  *
  * Scale note: only checkpoints are O(live files); the commit hot path
  * (upserts, appends, single-series compaction) writes deltas. Readers
  * are safe against concurrent COMMITS at any time; [[vacuum]] must not
  * run concurrently with writers, and a reader racing vacuum may need
  * the one retry [[read]] performs (the rewrite-then-delete ordering
  * guarantees retained versions stay resolvable).
  */
object StoreLog {

  final case class Snapshot(version: Long, timestampMs: Long,
                            replaced: Seq[String], files: Seq[String])

  /** Every `CheckpointInterval`-th version is a CHECKPOINT (full live
    * file list); the versions between are DELTAS (add/remove lists vs
    * the previous version). This bounds the per-commit manifest cost by
    * the COMMIT's footprint, not the store's: a 1 GB upsert against a
    * 6M-file store writes the few hundred paths it touched, not a
    * 300 MB listing. Reading any version resolves ≤ interval−1 deltas
    * above its checkpoint ancestor — a bounded driver-side metadata
    * walk. (Pre-round-8.5 logs, whose every version carries `files`,
    * parse as all-checkpoints — fully backward compatible.)
    */
  val CheckpointInterval = 10

  /** Thrown when a concurrent commit replaced an overlapping partition
    * set — the caller's merge was computed against a stale base and
    * cannot be serialized after the winner.
    */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  private val mapper = new ObjectMapper()

  /** The log speaks java.nio, i.e. LOCAL filesystem paths. A URI-style
    * path (`hdfs://…`, `s3a://…`, even `file:…`) would resolve as a
    * bogus RELATIVE local path and the manifest machinery would
    * silently diverge from the actual store — reject it loudly. (An
    * HDFS port would swap these primitives for `FileContext.rename`,
    * which is the same atomic-no-overwrite CAS.)
    */
  def isLocal(path: String): Boolean =
    !path.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")

  private def requireLocal(path: String): String = {
    require(isLocal(path),
      s"StoreLog supports plain local filesystem paths only, got '$path' " +
        "(URI schemes would need the FileContext-based commit primitives)")
    path
  }

  def logDir(path: String): String = s"${requireLocal(path)}/_graft_log"

  private def verFile(path: String, v: Long): String =
    f"${logDir(path)}/v$v%08d.json"

  def exists(path: String): Boolean = {
    val d = Paths.get(logDir(path))
    Files.isDirectory(d) && listVersions(path).nonEmpty
  }

  /** Spark's hidden-path rule, mirrored exactly: `_`/`.`-prefixed names
    * are hidden UNLESS they contain '=' — a partition directory for an
    * underscore-named column (Bundles' `__uid=...`) is data, while
    * `_graft_log`, `_graft_txn_*`, `_SUCCESS` and dotfiles are not.
    */
  private def hiddenName(n: String): Boolean =
    (n.startsWith("_") || n.startsWith(".")) && !n.contains("=")

  /** Children of a directory with the stream closed eagerly (Files.list
    * leaks a descriptor if the stream is abandoned mid-iteration).
    */
  private def children(p: NioPath): Seq[NioPath] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  def listVersions(path: String): Seq[Long] = {
    val d = Paths.get(logDir(path))
    if (!Files.isDirectory(d)) return Seq.empty
    children(d).map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d{8}\\.json") => n.substring(1, 9).toLong }
      .sorted
  }

  def latestVersion(path: String): Option[Long] = listVersions(path).lastOption

  private def strings(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  private def readRaw(path: String, version: Long): JsonNode = {
    val f = Paths.get(verFile(path, version))
    require(Files.exists(f), s"store log has no version $version at $f")
    mapper.readTree(Files.readAllBytes(f))
  }

  def read(path: String, version: Long): Snapshot = {
    // one retry: a concurrent vacuum may delete a delta's checkpoint
    // ancestor, but only AFTER atomically rewriting the oldest retained
    // version as a checkpoint — so re-walking from the requested
    // version sees the rewritten (now self-contained) manifest. Reads
    // of versions vacuum actually DROPPED still fail, as they should.
    try readResolve(path, version)
    catch { case _: IllegalArgumentException => readResolve(path, version) }
  }

  private def readResolve(path: String, version: Long): Snapshot = {
    val root = readRaw(path, version)
    val files =
      if (root.has("files")) strings(root.get("files"))
      else {
        // walk raw manifests down to the checkpoint ancestor collecting
        // the deltas, then apply them FORWARD over one mutable set —
        // one checkpoint parse + one final sort, not a full Snapshot
        // materialization per chain level
        var v = version - 1
        var deltas = List(root) // newest-last after the walk below
        var node = readRaw(path, v)
        while (!node.has("files")) {
          deltas ::= node
          v -= 1
          node = readRaw(path, v)
        }
        val acc = scala.collection.mutable.Set[String](strings(node.get("files")): _*)
        deltas.foreach { d =>
          acc --= strings(d.get("remove"))
          acc ++= strings(d.get("add"))
        }
        acc.toSeq.sorted
      }
    Snapshot(root.get("version").asLong(), root.get("timestampMs").asLong(),
      strings(root.get("replaced")), files)
  }

  def latest(path: String): Option[Snapshot] =
    latestVersion(path).map(read(path, _))

  /** Atomically publish the next version after `expectedVersion` (0 =
    * creating a fresh log). Returns the committed version. Fails with
    * [[CommitConflict]] if another writer got there first — the caller
    * decides whether a rebase is sound.
    *
    * When `parent` is the resolved snapshot at `expectedVersion` (the
    * caller holds it anyway — it computed `files` from it) and the new
    * version is not checkpoint-due, the manifest is written as a DELTA
    * (add/remove vs the parent): O(commit footprint), not O(store).
    * Without a parent — or on the checkpoint cadence — the full list is
    * written.
    */
  /** Serialize one manifest. `delta` carries (parentFiles, files) when
    * the version should be stored as add/remove lists; otherwise the
    * full `files` list is embedded (checkpoint).
    */
  private def manifestBytes(version: Long, timestampMs: Long,
                            replaced: Seq[String], files: Seq[String],
                            parentFiles: Option[Seq[String]]): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("version", version)
    root.put("timestampMs", timestampMs)
    def arr(xs: Seq[String]): ArrayNode = {
      val a = mapper.createArrayNode(); xs.foreach(a.add); a
    }
    root.set[JsonNode]("replaced", arr(replaced.sorted))
    parentFiles match {
      case Some(prev) =>
        val next = files.toSet; val prevSet = prev.toSet
        root.set[JsonNode]("add", arr((next -- prevSet).toSeq.sorted))
        root.set[JsonNode]("remove", arr((prevSet -- next).toSeq.sorted))
      case None =>
        root.set[JsonNode]("files", arr(files.sorted))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
  }

  def commit(path: String, expectedVersion: Long, replaced: Seq[String],
             files: Seq[String], parent: Option[Snapshot] = None): Long = {
    val v = expectedVersion + 1
    parent.foreach(p => require(p.version == expectedVersion,
      s"parent snapshot v${p.version} does not match expectedVersion $expectedVersion"))
    val dir = Paths.get(logDir(path))
    Files.createDirectories(dir)
    val asDelta = parent.filter(_ => v % CheckpointInterval != 0).map(_.files)
    val bytes = manifestBytes(v, System.currentTimeMillis(), replaced, files, asDelta)
    val tmp = Files.createTempFile(dir, ".commit_", ".tmp")
    try {
      Files.write(tmp, bytes)
      // POSIX link(2) is atomic and fails with EEXIST if the target
      // exists — the CAS. (fs.rename would silently OVERWRITE on a
      // local filesystem, losing the racing writer's commit; on HDFS
      // rename-no-overwrite is the same primitive and this would use
      // FileContext.rename there.)
      try Files.createLink(Paths.get(verFile(path, v)), tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new CommitConflict(
            s"version $v already committed at $path — concurrent writer won")
      }
      v
    } finally Files.deleteIfExists(tmp)
  }

  /** List the store's CURRENT data files (relative paths) straight from
    * the directory — used to initialize a log over a store written
    * before logging, and by [[TsStore.vacuum]]. Hidden names
    * (`_`/`.`-prefixed path components: the log itself, txn staging
    * dirs, Spark's _SUCCESS markers) are excluded at every level.
    */
  def listDataFiles(path: String): Seq[String] = {
    val root = Paths.get(requireLocal(path))
    if (!Files.isDirectory(root)) return Seq.empty
    def hidden(p: NioPath): Boolean = hiddenName(p.getFileName.toString)
    val out = Seq.newBuilder[String]
    def walk(p: NioPath): Unit =
      children(p).filterNot(hidden).foreach { c =>
        if (Files.isDirectory(c)) walk(c)
        else if (c.getFileName.toString.endsWith(".parquet"))
          out += root.relativize(c).toString
      }
    walk(root)
    out.result().sorted
  }

  /** Ensure a log exists, initializing version 1 from the current
    * directory contents if not. Init races resolve through the same CAS:
    * both writers list the same committed files (staging dirs are
    * hidden), so the loser just adopts the winner's identical v1.
    */
  def ensure(path: String): Snapshot =
    latest(path).getOrElse {
      try { commit(path, 0L, Seq.empty, listDataFiles(path)); () }
      catch { case _: CommitConflict => () }
      latest(path).get
    }

  /** Drop the log (used by mode=Overwrite writes: an overwrite is a new
    * store; a stale manifest naming deleted files must not survive it).
    */
  def delete(path: String): Unit = {
    val d = new java.io.File(logDir(path))
    if (d.exists()) org.apache.commons.io.FileUtils.deleteQuietly(d)
    ()
  }

  /** Garbage-collect: delete data files referenced by NO retained
    * snapshot and drop manifests older than the latest `retainVersions`.
    * Time travel beyond the retained window dies here, by declaration —
    * vacuum is the storage-reclaim lever, exactly as in table formats.
    * Returns the number of data files deleted.
    */
  def vacuum(path: String, retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val versions = listVersions(path)
    if (versions.isEmpty) return 0
    val retained = versions.takeRight(retainVersions)
    val live: Set[String] =
      retained.flatMap(v => read(path, v).files).toSet
    val deleted = listDataFiles(path).filterNot(live)
    deleted.foreach(f => Files.deleteIfExists(Paths.get(path, f)))
    // the oldest retained version may be a DELTA whose checkpoint
    // ancestor is about to be dropped — rewrite it as a checkpoint
    // (resolved BEFORE any manifest deletion; atomic in-place replace)
    // so every retained version stays self-resolvable
    val oldest = retained.head
    if (!readRaw(path, oldest).has("files")) {
      val snap = read(path, oldest)
      val tmp = Files.createTempFile(Paths.get(logDir(path)), ".ckpt_", ".tmp")
      try {
        Files.write(tmp, manifestBytes(snap.version, snap.timestampMs,
          snap.replaced, snap.files, parentFiles = None))
        Files.move(tmp, Paths.get(verFile(path, oldest)),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      } finally Files.deleteIfExists(tmp)
    }
    versions.dropRight(retainVersions)
      .foreach(v => Files.deleteIfExists(Paths.get(verFile(path, v))))
    // stale txn staging dirs (a writer that crashed before adopting its
    // staged files) are hidden from listDataFiles and from readers —
    // this is their one reclaim point. AGE-gated (mtime > 1h), the
    // Delta/Iceberg convention: a merely in-flight writer's staging
    // survives even if someone vacuums against the documented
    // no-concurrent-writers contract.
    val txnCutoffMs = System.currentTimeMillis() - 60L * 60 * 1000
    children(Paths.get(path))
      .filter { p =>
        Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("_graft_txn_") &&
          Files.getLastModifiedTime(p).toMillis < txnCutoffMs
      }
      .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
    // prune now-empty partition directories so discovery doesn't surface
    // phantom empty partitions
    def pruneEmpty(p: NioPath): Unit = {
      children(p).filter(Files.isDirectory(_)).foreach(pruneEmpty)
      if (children(p).isEmpty && !hiddenName(p.getFileName.toString))
        Files.deleteIfExists(p)
    }
    children(Paths.get(path))
      .filter(p => Files.isDirectory(p) && !hiddenName(p.getFileName.toString))
      .foreach(pruneEmpty)
    deleted.size
  }

  /** Move every staged data file from `stagingDir` (a txn-private
    * directory Spark wrote with the store's partitioning) into the store
    * root, preserving partition subpaths. Returns the moved files'
    * store-relative paths. Filenames are unique per Spark write job
    * (UUID-stamped), so moves cannot collide; files surface in the
    * store directory but stay INVISIBLE to manifest readers until the
    * commit that names them.
    */
  def adoptStaged(path: String, stagingDir: String): Seq[String] = {
    val stage = Paths.get(stagingDir)
    val root = Paths.get(requireLocal(path))
    val staged = Seq.newBuilder[(NioPath, String)]
    def walk(p: NioPath): Unit =
      children(p)
        .filterNot(c => hiddenName(c.getFileName.toString))
        .foreach { c =>
          if (Files.isDirectory(c)) walk(c)
          else if (c.getFileName.toString.endsWith(".parquet"))
            staged += ((c, stage.relativize(c).toString))
        }
    walk(stage)
    staged.result().map { case (src, rel) =>
      val dst = root.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      rel
    }.sorted
  }
}
