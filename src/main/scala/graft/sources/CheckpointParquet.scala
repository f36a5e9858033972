package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.{ColumnIOFactory, DelegatingPositionOutputStream,
  DelegatingSeekableInputStream, InputFile, OutputFile, PositionOutputStream,
  SeekableInputStream}
import org.apache.parquet.schema.MessageTypeParser

/** The COLUMNAR checkpoint payload behind [[StoreLog]] — the public
  * Delta-checkpoint idea (a parquet file of the live-file list with a
  * JSON stats string per file) re-derived for this store's manifest
  * protocol. JSON checkpoints embed the full live list + per-file
  * stats/sizes/dvs as a pretty-printed object: readable and fine at
  * thousands of files, but at a MILLION files the checkpoint is
  * hundreds of MB of text and every plan pays a full Jackson tree
  * parse — the one remaining O(files) driver cost at 100 TB. A parquet
  * payload is ~20-40× smaller on disk (dictionary + snappy over the
  * shared path prefixes), decodes by streaming row groups without ever
  * materializing a DOM, and keeps the per-file attributes columnar so
  * a future stripe-lazy reader can skip what it doesn't need.
  *
  * One row per live file, schema:
  * {{{
  * message graft_checkpoint {
  *   required binary path (STRING);   // store-relative data file path
  *   optional int64 size;             // byte length (the manifest sizes index)
  *   optional binary stats (STRING);  // FileStats JSON, compact
  *   optional binary dv (STRING);     // Dv.Entry JSON, compact
  * }
  * }}}
  *
  * The payload is a SIDECAR next to the JSON manifest
  * (`vNNNNNNNN-<uuid>.ckpt.parquet` in the log dir); the manifest keeps
  * the commit protocol role (the CAS target, the version/tag/props
  * carrier) and shrinks to an O(1) pointer (`filesRef` + `fileCount`).
  * The sidecar is staged BEFORE the manifest publishes, so readers can
  * never see a dangling pointer; a CAS loser deletes its sidecar (and
  * vacuum reclaims aged unreferenced ones — crash insurance).
  *
  * Everything round-trips through the SAME JSON codecs the inline
  * format uses ([[FileStats.toJson]]/[[FileStats.fromJson]],
  * [[StoreLog.dvEntryJson]]/[[StoreLog.dvEntryFromJson]]) — one
  * serialization dialect, two containers.
  *
  * IO is bytes-in/bytes-out (in-memory [[InputFile]]/[[OutputFile]]):
  * the payload reaches storage through the SAME [[CommitIo]] seam as
  * every manifest, so object-store backends (mock S3, conditional-PUT
  * impls) carry checkpoints with zero extra surface. A million-file
  * payload is a few tens of MB in memory — bounded, and strictly less
  * than what the Jackson DOM of the same content would allocate.
  */
object CheckpointParquet {

  private val Schema = MessageTypeParser.parseMessageType(
    """message graft_checkpoint {
      |  required binary path (STRING);
      |  optional int64 size;
      |  optional binary stats (STRING);
      |  optional binary dv (STRING);
      |}""".stripMargin)

  /** Serialize one checkpoint payload. `files` is written SORTED (the
    * order [[StoreLog.Snapshot.files]] promises), one row group per
    * ~64k rows so a streaming reader's working set stays bounded.
    */
  def write(files: Seq[String],
            stats: Map[String, FileStats.FileStatsMap],
            sizes: Map[String, Long],
            dvs: Map[String, Dv.Entry]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(1 << 20)
    val mapper = new ObjectMapper()
    val factory = new SimpleGroupFactory(Schema)
    val writer = ExampleParquetWriter.builder(new BytesOutputFile(buf))
      .withType(Schema)
      .withConf(new org.apache.hadoop.conf.Configuration(false))
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withRowGroupSize(4L << 20)
      .withDictionaryEncoding(true)
      .build()
    try files.sorted.foreach { f =>
      val g = factory.newGroup()
      g.append("path", f)
      sizes.get(f).foreach(s => g.append("size", s))
      stats.get(f).foreach(m =>
        g.append("stats", mapper.writeValueAsString(FileStats.toJson(mapper, m))))
      dvs.get(f).foreach(e =>
        g.append("dv", mapper.writeValueAsString(StoreLog.dvEntryJson(mapper, e))))
      writer.write(g)
    } finally writer.close()
    buf.toByteArray
  }

  /** Decode a checkpoint payload: (files, stats, sizes, dvs) — exactly
    * the tuple the inline-JSON resolution produces. Row groups stream
    * one at a time; per-file JSON blobs parse individually (no
    * whole-checkpoint DOM ever exists).
    */
  def read(bytes: Array[Byte]): (Seq[String],
      Map[String, FileStats.FileStatsMap], Map[String, Long],
      Map[String, Dv.Entry]) = {
    val mapper = new ObjectMapper()
    val files = Seq.newBuilder[String]
    val stats = Map.newBuilder[String, FileStats.FileStatsMap]
    val sizes = Map.newBuilder[String, Long]
    val dvs = Map.newBuilder[String, Dv.Entry]
    val reader = ParquetFileReader.open(new BytesInputFile(bytes))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val columnIO = new ColumnIOFactory().getColumnIO(schema)
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val rr = columnIO.getRecordReader(pages, new GroupRecordConverter(schema))
        var i = 0L
        val n = pages.getRowCount
        while (i < n) {
          val g = rr.read()
          val p = g.getString("path", 0)
          files += p
          if (g.getFieldRepetitionCount("size") > 0)
            sizes += p -> g.getLong("size", 0)
          if (g.getFieldRepetitionCount("stats") > 0)
            stats += p -> FileStats.fromJson(mapper.readTree(g.getString("stats", 0)))
          if (g.getFieldRepetitionCount("dv") > 0)
            dvs += p -> StoreLog.dvEntryFromJson(mapper.readTree(g.getString("dv", 0)))
          i += 1
        }
        pages = reader.readNextRowGroup()
      }
    } finally reader.close()
    (files.result(), stats.result(), sizes.result(), dvs.result())
  }

  /** In-memory parquet sink — checkpoint bytes flow to storage through
    * [[CommitIo]], never a direct filesystem API.
    */
  private final class BytesOutputFile(buf: java.io.ByteArrayOutputStream)
      extends OutputFile {
    private def stream(): PositionOutputStream =
      new DelegatingPositionOutputStream(buf) {
        override def getPos: Long = buf.size().toLong
      }
    override def create(blockSizeHint: Long): PositionOutputStream = stream()
    override def createOrOverwrite(blockSizeHint: Long): PositionOutputStream =
      stream()
    override def supportsBlockSize(): Boolean = false
    override def defaultBlockSize(): Long = 0L
  }

  /** ByteArrayInputStream with its cursor exposed — the seek/getPos
    * pair [[DelegatingSeekableInputStream]] leaves abstract must track
    * the SAME position the delegated reads advance.
    */
  private final class SeekableBytes(bytes: Array[Byte])
      extends java.io.ByteArrayInputStream(bytes) {
    def position: Long = pos.toLong
    def position(p: Long): Unit = { pos = p.toInt }
  }

  private final class BytesInputFile(bytes: Array[Byte]) extends InputFile {
    override def getLength: Long = bytes.length.toLong
    override def newStream(): SeekableInputStream = {
      val s = new SeekableBytes(bytes)
      new DelegatingSeekableInputStream(s) {
        override def getPos: Long = s.position
        override def seek(newPos: Long): Unit = s.position(newPos)
      }
    }
  }
}
