package graft.sources

/** The minimal object-store client surface [[CondPutIo]] needs — the
  * S3-class API shape: whole-object puts/gets over a FLAT key space, no
  * rename, no directories, plus ONE conditional primitive:
  * [[putIfNoneMatch]], the atomic create-if-absent every major object
  * store now exposes (S3 `If-None-Match: *` conditional PUT, GCS
  * `x-goog-if-generation-match: 0`, Azure Blob `If-None-Match: *`).
  * That single primitive is all the [[StoreLog]] commit protocol
  * requires of a backend — the rest is ordinary object CRUD.
  *
  * A production implementation wraps the vendor SDK; tests back it with
  * an in-process emulation whose conditional put uses the kernel's own
  * create-exclusive as the "service side" (see StoreObjectIoSpec).
  * Implementations must be thread-safe and must make every put
  * ALL-OR-NOTHING from a reader's perspective (object-store semantics:
  * an object is never observable half-written).
  */
trait ObjectApi {

  /** Atomically create `key` with `bytes` iff no object exists there.
    * False on a precondition failure (a concurrent writer created it
    * first) — the CAS the commit protocol rides.
    */
  def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean

  /** Unconditional whole-object put (create or replace), atomic to
    * readers.
    */
  def put(key: String, bytes: Array[Byte]): Unit

  def get(key: String): Array[Byte]

  /** Object metadata, or None when no such object. */
  def head(key: String): Option[ObjectApi.Head]

  /** Quiet on a missing key. */
  def delete(key: String): Unit

  /** Server-side copy (the object-store "move" half; the other half is
    * [[delete]]).
    */
  def copy(src: String, dst: String): Unit

  /** Every key strictly under `prefix` (recursive — the flat-namespace
    * listing; [[CondPutIo]] derives directory-ish views from it).
    */
  def listPrefix(prefix: String): Seq[String]

  /** Refresh the object's modification time (metadata self-copy in
    * object-store terms).
    */
  def touch(key: String): Unit
}

object ObjectApi {
  final case class Head(lengthBytes: Long, mtimeMs: Long)
}

/** [[CommitIo]] over a conditional-PUT object store: the third backend
  * family behind the seam, covering S3-class stores that have NO atomic
  * rename (plain-S3 `rename` is copy+delete — the reason
  * [[CommitIo.forPath]] refuses such schemes by default). With the
  * store's conditional PUT as the publish primitive, the same
  * stage→adopt→publish protocol holds:
  *
  *   - [[publishIfAbsent]] IS `If-None-Match: *` — the manifest CAS, no
  *     staging file needed (an object put is all-or-nothing already);
  *   - [[replaceAtomic]] is a plain put (atomic object replacement);
  *   - directory semantics are DERIVED: an object store has only keys,
  *     so `isDir`/`list` are prefix views, `move` is copy+delete (the
  *     trait never requires move atomicity — adopted data files are
  *     UUID-stamped), and `deleteDirIfEmpty` is a no-op because empty
  *     directories cannot exist.
  *
  * Register an instance for a scheme via [[CommitIo.register]] and a
  * `mocks3://…`-style store becomes fully logged/upsertable, while the
  * DATA plane (parquet files) rides whatever Hadoop FileSystem serves
  * the same scheme — exactly the split a real S3 deployment has (s3a
  * for data, conditional PUT for commits).
  */
final class CondPutIo(api: ObjectApi) extends CommitIo {

  override def publishIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    api.putIfNoneMatch(path, bytes)

  override def replaceAtomic(path: String, bytes: Array[Byte]): Unit =
    api.put(path, bytes)

  override def readBytes(path: String): Array[Byte] = api.get(path)

  override def exists(path: String): Boolean = api.head(path).isDefined

  override def isDir(path: String): Boolean =
    api.listPrefix(path + "/").nonEmpty

  override def list(dir: String): Seq[CommitIo.Entry] = {
    val prefix = dir + "/"
    // immediate children of the prefix (the delimiter view): a key
    // "p/a/b" contributes child directory "a"; "p/a" contributes file "a"
    api.listPrefix(prefix).map(_.substring(prefix.length))
      .foldLeft(Map.empty[String, Boolean]) { (acc, rest) =>
        val i = rest.indexOf('/')
        if (i < 0) acc + (rest -> acc.getOrElse(rest, false))
        else acc + (rest.substring(0, i) -> true)
      }
      .toSeq.sortBy(_._1)
      .map { case (name, d) => CommitIo.Entry(name, d) }
  }

  override def move(src: String, dst: String): Unit = {
    api.copy(src, dst)
    api.delete(src)
  }

  override def deleteFile(path: String): Unit = api.delete(path)

  override def touch(path: String): Unit = api.touch(path)

  override def deleteDir(path: String): Unit = {
    api.listPrefix(path + "/").foreach(api.delete)
    api.delete(path) // a marker object at the bare key, if any
  }

  /** Object stores have no empty directories — nothing to reclaim. */
  override def deleteDirIfEmpty(path: String): Unit = ()

  override def mtimeMs(path: String): Long =
    api.head(path).map(_.mtimeMs).getOrElse(
      throw new java.io.FileNotFoundException(s"no object at $path"))
}
