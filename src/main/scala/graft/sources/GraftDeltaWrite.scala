package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expression, Expressions, NamedReference, SortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, RowLevelOperation, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA-BASED (merge-on-read) row-level operations — SQL `UPDATE`,
  * `MERGE INTO`, and subquery `DELETE` on a graft table whose
  * `delete.mode` is `dv`. The copy-on-write twin
  * ([[GraftRowLevelOperation]]) rewrites every file that holds a
  * match; this operation rewrites NOTHING:
  *
  *   1. The operation scan reads the table WITH the physical row
  *      identity — the `(_file, _pos)` metadata columns (store-relative
  *      data file + parquet row index, the exact identity the deletion
  *      vectors are keyed by). Spark's delta rewrite plans only the
  *      MATCHED rows through the writer (no survivor copying), so
  *      pushed predicates may reach the parquet reader — row-group
  *      skips drop only rows the plan never wanted, and row indices
  *      stay absolute underneath.
  *   2. Each writer task turns `delete`d row IDs into per-file POSITION
  *      BUFFERS and `insert`ed rows into staged canonical-layout
  *      parquet; an `update` is a delete plus an insert in place. At
  *      task commit the buffers become deletion-vector FRAGMENT
  *      sidecars in the staging directory — executor-side IO, the
  *      driver sees one (file, fragment, count) triple per touched
  *      file.
  *   3. The driver commit adopts the staged inserts and fragments,
  *      resolves each touched file's final vector (a lone fresh
  *      fragment adopts as-is; multiple fragments or an existing
  *      vector union DISTRIBUTED into one sidecar), and publishes ONE
  *      manifest version carrying the new files and the changed dv
  *      entries — atomic, time-travelable, conflict-checked against
  *      concurrent writers by the same prefix-replace rules as the dv
  *      DELETE.
  *
  * Cost at 100 TB: an UPDATE of a thousand rows scattered across a
  * million files writes a thousand sidecar positions and a thousand
  * new rows — not a million-file rewrite, and not even the
  * copy-on-write path's thousand-file rewrite. Compaction later
  * materializes the vectors and restores fully-columnar scans.
  */
class GraftDeltaRowLevelOperation(path: String, tableSchema: StructType,
                                  uids: Seq[String], tsCol: String,
                                  cmd: RowLevelOperation.Command)
  extends org.apache.spark.sql.connector.write.SupportsDelta {

  @volatile private var builtScan: GraftScan = _

  private val statCols = GraftDeltaWrite.dvStatCols(tableSchema)

  override def command(): RowLevelOperation.Command = cmd

  /** The stat-capped data columns ride the operation as METADATA
    * ATTRIBUTES: Spark projects their pre-mutation (OLD) values into
    * every delete()/update() call, which is exactly what the commit
    * needs to record per-column DELETED-NULL counts and DELETED-ROW
    * bounds on the vector entry ([[Dv.Entry]]) — the same stats the
    * DELETE verb records, so COUNT(col)/MIN/MAX/grouped-COUNT
    * pushdowns stay manifest answers on UPDATE/MERGE-vectored files
    * instead of de-optimizing until compaction. The widened operation
    * scan costs what deleteVectors' find scan always paid: the
    * stat-capped columns of the MATCHED files only.
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    statCols.map(c => Expressions.column(c.name): NamedReference).toArray

  /** The physical row identity: data file + parquet row index — the
    * deletion vectors' own key. Non-nullable metadata columns (Spark
    * refuses nullable row IDs).
    */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftTable.FileColName),
    Expressions.column(GraftTable.PosColName))

  /** Keep UPDATE rows whole: the writer splits them into a vector
    * position and an appended row itself — no plan-side Expand into
    * delete+insert pairs.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(SparkSession.active, path, None, tableSchema,
      rowLevel = true, rowLevelDelta = true) {
      override def build(): org.apache.spark.sql.connector.read.Scan = {
        val s = super.build().asInstanceOf[GraftScan]
        builtScan = s
        s
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(path, info.schema(), uids, tsCol, cmd,
          () => Option(builtScan), statCols)
    }

  override def description(): String = s"graft-delta-$cmd:$path"
}

private[graft] object GraftDeltaWrite {

  /** One stat-recorded column of a delta operation: declared (logical)
    * name — what the metadata attribute resolves — and the PHYSICAL
    * parquet name the manifest stats (and therefore [[Dv.Entry]] keys)
    * live under; `tag` is the [[FileStats.ColStat]] value domain
    * ("i"/"d"/"ts"/"s"), or "" for columns that get a deleted-NULL
    * count but no bound domain (float/double — NaN-refused by the
    * pushdowns anyway — NTZ times, and every other type).
    */
  final case class DvStatCol(name: String, phys: String, tag: String,
                             dt: DataType)

  /** The columns a delta DML records deleted-row stats for: the first
    * [[FileStats.MaxStatsCols]] declared fields, schema order — the
    * same cap the manifest file stats are bounded by, so a 500-column
    * table pays per-deleted-row cost for 24 columns, not 500.
    */
  def dvStatCols(tableSchema: StructType): Seq[DvStatCol] =
    tableSchema.fields.take(FileStats.MaxStatsCols).toSeq.map { f =>
      val tag = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => "i"
        case DateType => "d"
        case TimestampType => "ts"
        case StringType => "s"
        case _ => ""
      }
      DvStatCol(f.name, GraftTable.physicalName(f), tag, f.dataType)
    }

  /** Sum per-column deleted-null counts and combine deleted bounds
    * across a file's fragments. Positions are disjoint across
    * fragments (each deleted row is recorded exactly once), so the
    * counts SUM exactly; a column absent from any fragment's bounds
    * (over-cap string values) drops — exact-or-refuse.
    */
  def unionFragStats(frags: Seq[DvFrag]): (Map[String, Long], Map[String, Dv.Bound]) = {
    val nulls = frags.map(_.nulls).reduce { (a, b) =>
      a.flatMap { case (c, k) => b.get(c).map(o => c -> (k + o)) }
    }
    val bounds = frags.map(_.bounds).reduce { (a, b) =>
      a.flatMap { case (c, x) =>
        b.get(c).collect { case y if y.tag == x.tag =>
          c -> Dv.combineBounds(x, y)
        }
      }
    }
    (nulls, bounds)
  }

  /** Merge a file's fresh deleted-row stats with its PRE-EXISTING
    * vector entry's — the same both-know-or-drop rule as the DELETE
    * verb ([[TsStore.deleteVectors]]): a legacy entry without recorded
    * stats keeps the union unknowable rather than guessed.
    */
  def mergeWithOld(old: Option[Dv.Entry], nulls: Map[String, Long],
      bounds: Map[String, Dv.Bound]): (Map[String, Long], Map[String, Dv.Bound]) =
    old match {
      case Some(o) if o.rows > 0 =>
        (nulls.flatMap { case (c, k) => o.nulls.get(c).map(x => c -> (x + k)) },
         bounds.flatMap { case (c, b) =>
           o.bounds.get(c).collect { case ob if ob.tag == b.tag =>
             c -> Dv.combineBounds(ob, b)
           }
         })
      case _ => (nulls, bounds)
    }
}

/** The delta write: required layout, task writers, and the one-commit
  * vector+insert publish.
  */
private[sources] class GraftDeltaWrite(path: String, rowSchema: StructType,
    uids: Seq[String], tsCol: String, cmd: RowLevelOperation.Command,
    scanOf: () => Option[GraftScan],
    statCols: Seq[GraftDeltaWrite.DvStatCol])
  extends DeltaWrite with RequiresDistributionAndOrdering {

  private def fileRef: Expression = Expressions.column(GraftTable.FileColName)

  /** DELETE deltas carry only row IDs — cluster by file so each
    * vector's positions land in one task. UPDATE/MERGE rows carry the
    * (new) row too: clustering by (uids..., _file) keeps a file's
    * positions together for same-key mutations AND spreads MERGE's
    * not-matched inserts (null `_file`) across tasks by their series
    * key instead of funneling them through one null-cluster task.
    */
  override def requiredDistribution(): Distribution = cmd match {
    case RowLevelOperation.Command.DELETE =>
      Distributions.clustered(Array(fileRef))
    case _ =>
      Distributions.clustered(
        (uids.filter(rowSchema.fieldNames.contains).map(c =>
          Expressions.column(c): Expression) :+ fileRef).toArray)
  }

  /** Within a task: position order for pure deletes (sequential sidecar
    * fill), the store's canonical (uids..., ts) order otherwise — the
    * appended files then carry the same tight per-file ts bounds as
    * every other write path, keeping the layout-order contract.
    */
  override def requiredOrdering(): Array[SortOrder] = cmd match {
    case RowLevelOperation.Command.DELETE =>
      Array(
        Expressions.sort(fileRef,
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING),
        Expressions.sort(Expressions.column(GraftTable.PosColName),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    case _ =>
      GraftBatchWrite.canonicalOrdering(rowSchema, uids, tsCol)
  }

  override def toBatch: DeltaBatchWrite = {
    val spark = SparkSession.active
    val staging = TsStore.txnDir(path)
    val (factory, conf, maxRecords) =
      GraftBatchWrite.parquetSetup(spark, path, rowSchema, uids)
    new GraftDeltaBatchWrite(path, staging, rowSchema, uids, tsCol,
      factory, conf, maxRecords, scanOf, statCols)
  }

  override def description(): String = s"graft-delta-write-$cmd:$path"
}

private[sources] class GraftDeltaBatchWrite(path: String, staging: String,
    rowSchema: StructType, uids: Seq[String], tsCol: String,
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: GraftSerializableConf, maxRecordsPerFile: Long,
    scanOf: () => Option[GraftScan],
    statCols: Seq[GraftDeltaWrite.DvStatCol])
  extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(staging, rowSchema, uids, tsCol, factory,
      conf, maxRecordsPerFile, statCols)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val msgs = messages.toSeq.collect { case m: GraftDeltaTaskResult => m }
    val inserts = msgs.flatMap(_.files)
    val frags = msgs.flatMap(_.frags)
    val scan = scanOf().getOrElse(throw new IllegalStateException(
      "delta write committed without its operation scan"))
    val base = scan.snapshot
    StoreLog.withWriterLease(path) { lease =>
      // adopt only the committed attempts' named artifacts; everything
      // else in staging (failed/speculative attempts) dies with it
      val moved =
        try {
          val m = StoreLog.adoptStagedNamed(path, staging, inserts)
          StoreLog.adoptStagedNamed(path, staging, frags.map(_.rel))
          m
        } finally StoreLog.deleteStaging(staging)
      if (moved.isEmpty && frags.isEmpty) ()
      else {
        // final vector per touched file: a single fresh fragment IS the
        // sidecar; multiple fragments (a file's mutations split across
        // tasks) or an existing vector union DISTRIBUTED — one task per
        // file, executor-side IO, O(per-file deleted rows) each
        val byFile: Map[String, Seq[DvFrag]] = frags.groupBy(_.file)
        // fresh deleted-row stats per file (fragment union), then merged
        // with any pre-existing entry's — keeps COUNT(col)/MIN/MAX
        // manifest-answerable on UPDATE/MERGE-vectored files, exactly
        // like the DELETE verb's recording
        val statsOf: Map[String, (Map[String, Long], Map[String, Dv.Bound])] =
          byFile.map { case (f, fs) =>
            val (nulls, bounds) = GraftDeltaWrite.unionFragStats(fs)
            f -> GraftDeltaWrite.mergeWithOld(base.dvs.get(f), nulls, bounds)
          }
        val (direct, needMerge) = byFile.partition { case (f, fs) =>
          fs.size == 1 && !base.dvs.contains(f)
        }
        val mergedEntries: Seq[(String, Dv.Entry)] =
          if (needMerge.isEmpty) Seq.empty
          else {
            val sconf = new org.apache.spark.util.SerializableConfiguration(
              spark.sparkContext.hadoopConfiguration)
            val storePath = path // local copy — the closure must not drag `this`
            val items: Seq[(String, Seq[String])] = needMerge.toSeq.map {
              case (f, fs) =>
                f -> (fs.map(x => s"$storePath/${x.rel}") ++
                  base.dvs.get(f).map(e => s"$storePath/${e.path}").toSeq)
            }
            import spark.implicits._
            spark.createDataset(items).map { case (f, parts) =>
              val all = parts.iterator.flatMap(Dv.read(sconf.value, _)).toArray
              val rel = Dv.newRelPath()
              (f, rel, Dv.write(sconf.value, s"$storePath/$rel", all))
            }.collect().toSeq.map { case (f, rel, n) =>
              val (nulls, bounds) = statsOf(f)
              f -> Dv.Entry(rel, n, nulls, bounds)
            }
          }
        val entries: Map[String, Dv.Entry] =
          direct.map { case (f, fs) =>
            val (nulls, bounds) = statsOf(f)
            f -> Dv.Entry(fs.head.rel, fs.head.rows, nulls, bounds)
          } ++ mergedEntries
        // every position refers to a file of the SCANNED snapshot — a
        // concurrent replace of a touched partition (compaction, cow
        // delete, another dv write) invalidates it; same abort rule as
        // the dv DELETE
        val prefixes = entries.keySet.map { f =>
          val i = f.lastIndexOf('/')
          require(i > 0, s"live file '$f' is not under a partition directory")
          f.substring(0, i)
        }.toSeq.distinct.sorted
        TsStore.commitWithRebase(path, lease, base, moved, prefixes,
          newFiles = exp => exp.files ++ moved,
          unsound = (s, _) =>
            if (s.replaced.exists(prefixes.contains))
              Some(s"concurrent writer replaced ${prefixes.mkString(",")} at " +
                s"$path — re-run the operation against the new base")
            else None,
          addDvs = entries)
        ()
      }
    }
    // dv-density cue on the batch DML door too (outside the lease —
    // compaction takes its own): auto-compact per the table's
    // dv.compact.ratio property, or log the advisory
    if (frags.nonEmpty) TsStore.dvDensityCompact(spark, path)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StoreLog.deleteStaging(staging)
}

/** One deletion-vector FRAGMENT: the positions one task deleted from
  * one data file, plus the deleted rows' per-column stats (keyed by
  * PHYSICAL column name, [[FileStats.ColStat]] value domains) — what
  * the commit unions into the file's [[Dv.Entry]].
  */
private[graft] final case class DvFrag(file: String, rel: String, rows: Long,
    nulls: Map[String, Long], bounds: Map[String, Dv.Bound])

/** One task's artifacts: staged insert files + deletion-vector
  * fragments.
  */
private[graft] case class GraftDeltaTaskResult(
    files: Seq[String], frags: Seq[DvFrag])
  extends WriterCommitMessage

private[sources] class GraftDeltaWriterFactory(staging: String,
    rowSchema: StructType, uids: Seq[String], tsCol: String,
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: GraftSerializableConf, maxRecordsPerFile: Long,
    statCols: Seq[GraftDeltaWrite.DvStatCol])
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaDataWriter(staging, rowSchema, uids, tsCol, factory,
      conf, partitionId, taskId, maxRecordsPerFile, statCols)
}

/** The task writer: inserts ride the streaming-hardened hashed parquet
  * writer (per-partition-dir open files — correct under any arrival
  * order, optimal under the required one); deletes buffer positions
  * per data file and flush as fragment sidecars at commit. Memory is
  * O(task's deleted rows) longs — the same order as the sidecar bytes
  * the task is about to write.
  */
private[sources] class GraftDeltaDataWriter(staging: String,
    rowSchema: StructType, uids: Seq[String], tsCol: String,
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: GraftSerializableConf, partitionId: Int, taskId: Long,
    maxRecordsPerFile: Long,
    statCols: Seq[GraftDeltaWrite.DvStatCol])
  extends DeltaWriter[InternalRow] {

  // lazy: a pure-DELETE delta has an empty row schema and never inserts
  private lazy val insertW = new GraftHashedDataWriter(staging, rowSchema,
    uids, tsCol, factory, conf.value, partitionId, taskId, maxRecordsPerFile)
  private var insertsOpened = false
  private val positions =
    scala.collection.mutable.LinkedHashMap.empty[String, PerFileBuf]
  private val frags = Seq.newBuilder[DvFrag]
  private var fragSeq = 0
  private val flushRows = conf.value.getInt(
    GraftDeltaDataWriter.FragmentFlushKey, GraftDeltaDataWriter.FragmentFlushRows)
  private val statArr = statCols.toArray
  // per-column long-domain extractor for the METADATA row (the deleted
  // row's old values, projected in statCols order)
  private val longOf: Array[(InternalRow, Int) => Long] = statArr.map { c =>
    c.dt match {
      case ByteType => (r: InternalRow, i: Int) => r.getByte(i).toLong
      case ShortType => (r: InternalRow, i: Int) => r.getShort(i).toLong
      case IntegerType | DateType => (r: InternalRow, i: Int) => r.getInt(i).toLong
      case _ => (r: InternalRow, i: Int) => r.getLong(i)
    }
  }

  /** One file's pending positions + deleted-row stat accumulators:
    * per-column null counts, long-domain / string-domain running
    * bounds, and the over-cap-string drop marks. O(statCols) per
    * deleted row — the same order as the sidecar bytes themselves.
    */
  private final class PerFileBuf {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val nulls = new Array[Long](statArr.length)
    val lo = new Array[Long](statArr.length)
    val hi = new Array[Long](statArr.length)
    var seen = new Array[Boolean](statArr.length)
    val slo = new Array[String](statArr.length)
    val shi = new Array[String](statArr.length)
    val bad = new Array[Boolean](statArr.length)
  }

  private def flushFrag(file: String, b: PerFileBuf): Unit = {
    val rel = f"${Dv.Dir}%s/frag-$partitionId%05d-$taskId%d-$fragSeq%03d.bin"
    fragSeq += 1
    val nulls = statArr.iterator.zipWithIndex
      .map { case (c, i) => c.phys -> b.nulls(i) }.toMap
    val bounds = statArr.iterator.zipWithIndex.flatMap { case (c, i) =>
      if (c.tag.isEmpty || b.bad(i)) None
      else if (!b.seen(i)) Some(c.phys -> Dv.Bound.empty(c.tag))
      else if (c.tag == "s")
        Some(c.phys -> Dv.Bound(c.tag, Some(b.slo(i)), Some(b.shi(i))))
      else Some(c.phys -> Dv.Bound(c.tag, Some(b.lo(i)), Some(b.hi(i))))
    }.toMap
    frags += DvFrag(file, rel,
      Dv.write(conf.value, s"$staging/$rel", b.buf.toArray), nulls, bounds)
  }

  private def recordDelete(metadata: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString // copy — the id row is reused
    val b = positions.getOrElseUpdate(file, new PerFileBuf)
    b.buf += id.getLong(1)
    var i = 0
    while (i < statArr.length) {
      if (metadata.isNullAt(i)) b.nulls(i) += 1
      else {
        val tag = statArr(i).tag
        if (tag == "s") {
          if (!b.bad(i)) {
            val v = metadata.getUTF8String(i).toString
            if (v.length > FileStats.MaxStringLen) b.bad(i) = true
            else if (!b.seen(i)) { b.slo(i) = v; b.shi(i) = v; b.seen(i) = true }
            else {
              if (Dv.cmpBound("s", v, b.slo(i)) < 0) b.slo(i) = v
              if (Dv.cmpBound("s", v, b.shi(i)) > 0) b.shi(i) = v
            }
          }
        } else if (tag.nonEmpty) {
          val v = longOf(i)(metadata, i)
          if (!b.seen(i)) { b.lo(i) = v; b.hi(i) = v; b.seen(i) = true }
          else {
            if (v < b.lo(i)) b.lo(i) = v
            if (v > b.hi(i)) b.hi(i) = v
          }
        }
      }
      i += 1
    }
    // bound task memory: a fully-deleted 8M-row file is 64 MB of
    // positions, and a task may own MANY files — spill an over-cap
    // buffer as its own fragment (the commit-side union merges
    // multi-fragment files anyway)
    if (b.buf.length >= flushRows) {
      flushFrag(file, b)
      positions.remove(file)
    }
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    recordDelete(metadata, id)

  override def update(metadata: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    recordDelete(metadata, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = {
    insertsOpened = true
    insertW.write(row)
  }

  override def commit(): WriterCommitMessage = {
    val insertFiles =
      if (!insertsOpened) Seq.empty[String]
      else insertW.commit() match { case GraftWriteTaskResult(fs) => fs }
    positions.foreach { case (file, b) => flushFrag(file, b) }
    positions.clear()
    GraftDeltaTaskResult(insertFiles, frags.result())
  }

  override def abort(): Unit = if (insertsOpened) insertW.abort()

  override def close(): Unit = if (insertsOpened) insertW.close()
}

private[graft] object GraftDeltaDataWriter {
  /** Per-file position-buffer cap before an early fragment spill —
    * 4M longs = 32 MB; the commit-side union reassembles. Test seam:
    * the hadoop-conf key lowers it so specs can force the spill.
    */
  val FragmentFlushRows: Int = 4 << 20
  val FragmentFlushKey = "graft.delta.fragFlushRows"
}
