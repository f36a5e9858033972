package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.DeclaredQuery
import graft.sources.Tables

/** §2.10 — multimodal-column plumbing (north star). Media payloads are
  * opaque `binary` columns with typed metadata; the *decode* step is a
  * deliberate deterministic stub (no image/audio codecs exist in this
  * environment), while everything Spark-side — schema, partitioning,
  * per-partition batch shape, metadata extraction, frame sampling — is
  * real and oracle-checked.
  *
  * The fixture has no media files, so the binary payload is the utf-8
  * encoding of `documents.text` (cast string→binary): it exercises the
  * same byte-level plumbing a real jpeg/wav column would.
  */
object Multimodal {

  /** Typed metadata a real decoder would emit. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, fmt: String,
                       width: Long, height: Long)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false)))

  /** STUB decoder — the real-codec boundary. Deterministic fake: derives
    * "decoded" dimensions from the byte length alone, exactly mirroring
    * the SQL expressions in `mm_meta` (DecodeStubSpec asserts equality).
    * A real deployment swaps `decodeOne` for a codec call; the
    * mapPartitions shape (one iterator per partition, no per-row JVM↔lib
    * setup) is what matters at 100 TB.
    */
  def decodeOne(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val fmt = (n % 3) match {
      case 0 => "png"; case 1 => "jpg"; case _ => "wav"
    }
    MediaMeta(docId, n, fmt, 64L + n % 256L, 64L + n % 128L)
  }

  /** "Resized" media metadata (fake resize keeps the top-left byte). */
  case class MediaResize(doc_id: Long, out_w: Long, out_h: Long,
                         out_bytes: Long, first_byte: Long)

  val mediaResizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("out_w", LongType, nullable = false),
    StructField("out_h", LongType, nullable = false),
    StructField("out_bytes", LongType, nullable = false),
    StructField("first_byte", LongType, nullable = false)))

  /** STUB resize — a real deployment decodes, scales, re-encodes; the
    * deterministic fake caps the payload at w×h×3 bytes and keeps the
    * first byte (the "top-left pixel"), both SQL-mirrorable so the whole
    * mapPartitions pipeline is oracle-checked end to end.
    */
  def resizeOne(docId: Long, payload: Array[Byte], w: Int, h: Int): MediaResize =
    MediaResize(docId, w.toLong, h.toLong,
      math.min(payload.length.toLong, w.toLong * h * 3),
      // & 0xff: unsigned byte value, consistent with featureOne and with
      // the oracle's ascii() code point (exact for the ASCII fixtures)
      if (payload.isEmpty) -1L else (payload(0) & 0xff).toLong)

  /** STUB feature extraction — stands in for an embedding/codec feature
    * pass: mean byte value (the "average pixel intensity"). Exact-integer
    * sum then ONE double division → bit-identical to the oracle's
    * `CAST(list_sum(...) AS DOUBLE) / length`, no rounding needed.
    */
  def featureOne(payload: Array[Byte]): Double =
    if (payload.isEmpty) 0.0
    else {
      var s = 0L; var i = 0
      while (i < payload.length) { s += (payload(i) & 0xff); i += 1 }
      s.toDouble / payload.length
    }

  /** mapPartitions decode over a (doc_id, payload binary) DataFrame. */
  def decodeStub(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(mediaMetaSchema)
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val m = decodeOne(r.getLong(0), r.getAs[Array[Byte]](1))
          Row(m.doc_id, m.n_bytes, m.fmt, m.width, m.height)
        }
      }(enc)
  }

  def defs: Seq[(String, DeclaredQuery)] = Seq(

    "llm_mm_join" -> DeclaredQuery(
      // Multimodal assembly: text modality ⋈ vector modality by id. The
      // embeddings side is keyed and bounded → at 100 TB this is an
      // ordinary co-partitioned equi-join (or broadcast when the vector
      // table is the small side, as here).
      (s, d) => Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"),
          col("label").cast("long").as("label"),
          size(col("embedding")).cast("long").as("dim"),
          round(graft.functions.VectorOps.norm(col("embedding")), 4).as("vnorm"),
          substring(col("text"), 1, 24).as("head"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, lang, CAST(label AS BIGINT) AS label, " +
        "CAST(len(embedding) AS BIGINT) AS dim, " +
        "round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vnorm, " +
        "substring(text, 1, 24) AS head " +
        "FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"),
      "multimodal assembly: documents ⋈ embeddings, text + vector summary"),

    "mm_binary_source" -> DeclaredQuery(
      // RAW-FILE multimodal ingest — the missing first step of the
      // binary pipeline: media lands as FILES (images/audio dumped by a
      // crawler), and Spark's binaryFile source turns a directory of
      // them into (path, length, content) rows without any decode. Here
      // a deterministic landing zone is derived from the documents
      // fixture (each doc's UTF-8 bytes as one .bin file, 200 files),
      // read back via format("binaryFile"), keyed by the id parsed from
      // the path, and byte-verified: length and md5(content) must equal
      // the oracle's octet_length/md5 over the source text. At 100 TB
      // the same plan shape carries pathGlobFilter/recursiveFileLookup
      // partitioned crawls, and content flows as an opaque binary
      // column into the mm_* decode/dedup stages.
      (s, d) => {
        val root = graft.Q.scratchTempDir("binsrc_")
        Tables.documents(s, d).filter(col("doc_id") < 200)
          .select("doc_id", "text").collect()
          .foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(root, f"doc_${r.getLong(0)}%08d.bin"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(root)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
              .cast("long").as("doc_id"),
            col("length"), md5(col("content")).as("digest"))
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS length, " +
        "md5(text) AS digest FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
      "raw-file multimodal ingest: a landed media directory through the binaryFile source, byte-verified"),

    "mm_meta" -> DeclaredQuery(
      // Metadata extraction over the opaque binary payload — pure SQL
      // expressions (the oracle-checkable twin of decodeStub).
      (s, d) => {
        val nb = length(col("text").cast("binary")).cast("long")
        Tables.documents(s, d).select(
          col("doc_id"), nb.as("n_bytes"),
          when(nb % 3 === 0, "png").when(nb % 3 === 1, "jpg").otherwise("wav").as("fmt"),
          (lit(64L) + nb % 256).as("width"),
          (lit(64L) + nb % 128).as("height"),
          md5(col("text")).as("fingerprint"))
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CASE CAST(octet_length(encode(text)) AS BIGINT) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' " +
        "ELSE 'wav' END AS fmt, " +
        "64 + CAST(octet_length(encode(text)) AS BIGINT) % 256 AS width, " +
        "64 + CAST(octet_length(encode(text)) AS BIGINT) % 128 AS height, " +
        "md5(text) AS fingerprint FROM documents ORDER BY doc_id"),
      "typed metadata over opaque binary media payloads"),

    "mm_frames" -> DeclaredQuery(
      // Frame sampling: every 8th token plays the role of every Nth video
      // frame / audio window. Per-row generate + explode — embarrassingly
      // parallel, no shuffle before the final order.
      (s, d) => {
        // posexplode + filter (codegen'd generator) rather than building
        // per-row struct arrays through interpreted HOF lambdas.
        val toks = graft.functions.TextOps.tokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), posexplode(toks).as(Seq("pos", "frame")))
          .filter(col("pos") % 8 === 0)
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("frame_no"), col("frame"))
          .orderBy(col("doc_id"), col("frame_no"))
      },
      Some(s"WITH t AS (SELECT doc_id, ${Llm.ToksSql} AS toks FROM documents), " +
        "x AS (SELECT doc_id, list_filter(generate_series(1, len(toks)), i -> (i - 1) % 8 = 0) AS idx, toks FROM t) " +
        "SELECT doc_id, CAST(unnest(idx) AS BIGINT) AS frame_no, " +
        "unnest(list_transform(idx, i -> toks[i])) AS frame " +
        "FROM x ORDER BY doc_id, frame_no"),
      "frame/window sampling over tokenized payload (every 8th)"),

    "mm_resize" -> DeclaredQuery(
      // Resize + feature-extract through the REAL mapPartitions plumbing
      // (binary payload in, typed rows out, one iterator per partition —
      // the shape a codec batch would use), with SQL-mirrorable stub
      // arithmetic so the whole pipeline is oracle-checked: capped byte
      // count, top-left byte, exact mean byte value (integer sum, one
      // double division — no rounding divergence possible).
      (s, d) => {
        val spark = s
        val outSchema = StructType(mediaResizeSchema.fields :+
          StructField("mean_byte", DoubleType, nullable = false))
        val enc = org.apache.spark.sql.Encoders.row(outSchema)
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .mapPartitions { it: Iterator[Row] =>
            it.map { r =>
              val id = r.getLong(0); val p = r.getAs[Array[Byte]](1)
              val m = resizeOne(id, p, 32, 32)
              Row(m.doc_id, m.out_w, m.out_h, m.out_bytes, m.first_byte,
                featureOne(p))
            }
          }(enc)
          .orderBy(col("doc_id"))
      },
      // empty-payload sentinels mirrored (-1 / 0.0) so the oracle stays
      // exact even if a fixture regen introduces empty documents
      Some("SELECT doc_id, CAST(32 AS BIGINT) AS out_w, CAST(32 AS BIGINT) AS out_h, " +
        "least(CAST(octet_length(encode(text)) AS BIGINT), 3072) AS out_bytes, " +
        "CASE WHEN length(text) = 0 THEN -1 " +
        "ELSE CAST(ascii(substring(text, 1, 1)) AS BIGINT) END AS first_byte, " +
        "CASE WHEN length(text) = 0 THEN 0.0 " +
        "ELSE CAST(list_sum(list_transform(string_split(text, ''), c_ -> ascii(c_))) AS DOUBLE) " +
        "/ length(text) END AS mean_byte " +
        "FROM documents ORDER BY doc_id"),
      "resize + feature-extract stubs over mapPartitions (32×32 cap, mean byte)"),

    "mm_dedup" -> DeclaredQuery(
      // Content-hash dedup of raw media payloads — the standard image/
      // audio dedup step (identical bytes ⇒ identical media, no decode
      // needed): group on the md5 DIGEST of the binary payload so the
      // shuffle carries 16 bytes per distinct payload, never the media;
      // keep the min doc_id, count copies, carry the byte size. Distinct
      // from llm_dedup_exact (normalized text identity): this is RAW
      // byte identity, the pre-decode gate a multimodal pipeline runs
      // before any expensive near-dup pass.
      (s, d) => {
        val payload = col("text").cast("binary")
        Tables.documents(s, d)
          .select(col("doc_id"), md5(payload).as("__dg"),
            length(payload).cast("long").as("__nb"))
          .groupBy("__dg")
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
            min(col("__nb")).as("n_bytes"))
          .select(col("keep_id"), col("n_copies"), col("n_bytes"))
          .orderBy(col("keep_id"))
      },
      Some("SELECT min(doc_id) AS keep_id, count(*) AS n_copies, " +
        "CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes " +
        "FROM documents GROUP BY md5(text) ORDER BY keep_id"),
      "raw-payload content-hash dedup (16-byte digest shuffle, pre-decode gate)")
  )
}
