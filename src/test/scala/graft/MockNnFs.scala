package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileAlreadyExistsException, Path, RawLocalFileSystem}

/** A local-disk-backed `FileSystem` masquerading as scheme `mocknn` —
  * the test rig for [[graft.sources.CommitIo.Hadoop]]'s FileContext
  * rename branch. The scheme is deliberately NOT `file`, so
  * `resolveLocal` cannot reroute the publish to link(2): commits go
  * through `FileContext.rename(Rename.NONE)` exactly as they would on
  * HDFS. [[MockNnFs]] makes that rename honor the NameNode contract
  * (atomic no-overwrite) by serializing renames on a JVM-wide lock —
  * in-process races then behave as a real NameNode would, which is the
  * strongest emulation available without a daemon.
  */
class MockNnFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocknn"
  override def getUri: URI = URI.create("mocknn:///")
}

/** The AbstractFileSystem (FileContext-side) binding for `mocknn`.
  * Registered via `fs.AbstractFileSystem.mocknn.impl`.
  */
class MockNnFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockNnFileSystem, conf, "mocknn", false) {
  // the default renameInternal(overwrite) is CHECK-THEN-ACT over the
  // delegate; the lock turns it atomic within the JVM — the NameNode
  // contract, emulated for in-process race tests
  override def renameInternal(src: Path, dst: Path, overwrite: Boolean): Unit =
    MockNnFs.lock.synchronized {
      if (!overwrite && fsImpl.exists(dst))
        throw new FileAlreadyExistsException(dst.toString)
      super.renameInternal(src, dst, overwrite)
    }
}

object MockNnFs {
  private[graft] val lock = new Object
}
