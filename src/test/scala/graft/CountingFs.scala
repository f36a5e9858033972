package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileStatus, Path, RawLocalFileSystem}

/** Local disk masquerading as scheme `gcnt`, counting `getFileStatus`
  * calls against DATA files (`*.parquet`) — the instrumentation behind
  * the metadata-only-planning pin: a sizes-complete manifest must let
  * the DSv2 scan plan splits and report statistics with ZERO per-file
  * status RPCs (the million-file-store bottleneck the manifest exists
  * to remove).
  */
class CountingLocalFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "gcnt"
  override def getUri: URI = URI.create("gcnt:///")
  override def getFileStatus(f: Path): FileStatus = {
    if (f.toString.endsWith(".parquet"))
      CountingLocalFileSystem.parquetStatusCalls.incrementAndGet()
    super.getFileStatus(f)
  }
}

object CountingLocalFileSystem {
  val parquetStatusCalls = new AtomicLong(0)
}

/** The AbstractFileSystem (FileContext-side) binding for `gcnt`,
  * registered via `fs.AbstractFileSystem.gcnt.impl` — the commit
  * protocol's manifest IO routes through here.
  */
class CountingFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new CountingLocalFileSystem, conf, "gcnt", false)
