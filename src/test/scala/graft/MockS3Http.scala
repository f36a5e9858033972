package graft

import java.io.IOException
import java.net.{InetSocketAddress, URI, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption, StandardOpenOption}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.ObjectApi

/** An HTTP-LEVEL mock of an S3-class object service — the protocol rig
  * the directory-backed [[DirObjectApi]] can't be: requests arrive as
  * real wire shapes (PUT with `If-None-Match: *` answered 200-with-ETag
  * or 412, `x-amz-copy-source` server-side copies, ranged GETs with
  * `Content-Range` totals, ListObjectsV2 XML with `MaxKeys` pagination
  * and continuation tokens) and the client side ([[HttpObjectApi]])
  * speaks only HTTP — no filesystem call anywhere between the commit
  * protocol and the service. The service's storage is a real directory
  * (jailed under an allowed root) so the DATA plane — Spark's parquet
  * reader over a RawLocal binding — shares the backing store exactly
  * the way s3a shares a bucket with a conditional-PUT commit client.
  *
  * The service-side CAS is `CREATE_NEW` (kernel create-exclusive per
  * key), which is precisely the semantics the real header promises:
  * one winner per key, losers get 412.
  */
object MockS3Http {

  private val Rfc1123 = DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)

  /** Keys the server will serve: absolute paths under `allowedRoot`. */
  final class Server(allowedRoot: NioPath) {
    private val http = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    http.setExecutor(pool)
    http.createContext("/", (ex: HttpExchange) => handle(ex))
    http.start()

    /** Objects per list page — small so every real listing paginates. */
    val MaxKeys = 7

    // ------------------------------------------------ fault injection
    // One-shot counters (each burns one fault, the retry proceeds) plus
    // a periodic knob — the failure modes a real object service throws
    // at a commit protocol: throttling 503s, connections dying AFTER
    // the server applied the effect (ambiguous success), and listings
    // lagging behind writes (stale pages missing the newest key).
    @volatile var fault503Puts: Int = 0
    @volatile var faultAmbiguousPuts: Int = 0
    @volatile var fault503Gets: Int = 0
    @volatile var staleListDrops: Int = 0
    /** Every Nth PUT (any kind) answers 503 — sustained throttling for
      * the model check. 0 = off.
      */
    @volatile var fault503EveryNthPut: Int = 0
    private val putSeq = new java.util.concurrent.atomic.AtomicLong(0)

    private def takeFault(read: => Int, write: Int => Unit): Boolean =
      synchronized { if (read > 0) { write(read - 1); true } else false }

    private def putShould503(): Boolean = {
      val n = fault503EveryNthPut
      (n > 0 && putSeq.incrementAndGet() % n == 0) ||
        takeFault(fault503Puts, fault503Puts = _)
    }

    def port: Int = http.getAddress.getPort
    def base: String = s"http://127.0.0.1:$port"

    def stop(): Unit = { http.stop(0); pool.shutdownNow(); () }

    private def jailed(p: NioPath): Boolean = p.normalize.startsWith(allowedRoot)

    private def fileOf(ex: HttpExchange): NioPath =
      Paths.get(ex.getRequestURI.getPath) // URI.getPath percent-decodes

    private def md5(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString

    private def respond(ex: HttpExchange, code: Int,
                        body: Array[Byte] = Array.empty): Unit = {
      if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(code, -1)
      else if (body.isEmpty) ex.sendResponseHeaders(code, -1)
      else {
        ex.sendResponseHeaders(code, body.length.toLong)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      }
      ex.close()
    }

    private def queryParams(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
        .filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          if (i < 0) kv -> ""
          else URLDecoder.decode(kv.substring(0, i), UTF_8) ->
            URLDecoder.decode(kv.substring(i + 1), UTF_8)
        }.toMap

    private def handle(ex: HttpExchange): Unit = try {
      val params = queryParams(ex)
      if (ex.getRequestMethod == "GET" && params.contains("list-type"))
        handleList(ex, params) // the jail applies to the PREFIX param
      else {
        val f = fileOf(ex)
        if (!jailed(f)) { respond(ex, 403); return }
        ex.getRequestMethod match {
          case "GET" | "HEAD" => handleGet(ex, f)
          case "PUT" => handlePut(ex, f)
          case "DELETE" =>
            // S3 DELETE is 204 whether or not the object existed
            if (Files.isRegularFile(f)) Files.deleteIfExists(f)
            respond(ex, 204)
          case _ => respond(ex, 405)
        }
      }
    } catch {
      case _: IOException => try respond(ex, 500) catch { case _: IOException => () }
    }

    private def handleGet(ex: HttpExchange, f: NioPath): Unit = {
      if (takeFault(fault503Gets, fault503Gets = _)) { respond(ex, 503); return }
      if (!Files.isRegularFile(f)) { respond(ex, 404); return }
      val bytes = Files.readAllBytes(f)
      val mtime = Files.getLastModifiedTime(f).toMillis
      ex.getResponseHeaders.set("ETag", s""""${md5(bytes)}"""")
      ex.getResponseHeaders.set("Last-Modified",
        Rfc1123.format(java.time.Instant.ofEpochMilli(mtime)))
      // also surface ms precision the way SDK-visible metadata would —
      // RFC 1123 truncates to seconds, too coarse for lease freshness
      ex.getResponseHeaders.set("x-amz-meta-mtime-ms", mtime.toString)
      Option(ex.getRequestHeaders.getFirst("Range")) match {
        case Some(r) if r.startsWith("bytes=") =>
          // the HEAD-replacement ranged GET: 206 with the TOTAL in
          // Content-Range (or 416 with bytes */total on an empty object)
          if (bytes.isEmpty) {
            ex.getResponseHeaders.set("Content-Range", s"bytes */0")
            respond(ex, 416)
          } else {
            val spec = r.stripPrefix("bytes=").split('-')
            val lo = spec(0).toInt
            val hi = math.min(spec(1).toInt, bytes.length - 1)
            ex.getResponseHeaders.set("Content-Range",
              s"bytes $lo-$hi/${bytes.length}")
            respond(ex, 206, bytes.slice(lo, hi + 1))
          }
        case _ => respond(ex, 200, bytes)
      }
    }

    private def handlePut(ex: HttpExchange, f: NioPath): Unit = {
      if (putShould503()) { respond(ex, 503); return }
      val headers = ex.getRequestHeaders
      Option(headers.getFirst("x-amz-copy-source")) match {
        case Some(srcPath) =>
          val src = Paths.get(URLDecoder.decode(srcPath, UTF_8))
          if (!jailed(src) ) { respond(ex, 403); return }
          if (!Files.isRegularFile(src)) { respond(ex, 404); return }
          if (src.normalize == f.normalize &&
              Option(headers.getFirst("x-amz-metadata-directive"))
                .contains("REPLACE")) {
            // metadata self-copy — the S3 "touch"
            Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime
              .fromMillis(System.currentTimeMillis()))
            respond(ex, 200, copyResultXml(md5(Files.readAllBytes(f))))
          } else {
            Files.createDirectories(f.getParent)
            Files.copy(src, f, StandardCopyOption.REPLACE_EXISTING)
            respond(ex, 200, copyResultXml(md5(Files.readAllBytes(f))))
          }
        case None =>
          val body = {
            val is = ex.getRequestBody
            try is.readAllBytes() finally is.close()
          }
          val conditional =
            Option(headers.getFirst("If-None-Match")).contains("*")
          Files.createDirectories(f.getParent)
          if (conditional) {
            // the service-side CAS: create-exclusive, one winner per key
            try {
              Files.write(f, body, StandardOpenOption.CREATE_NEW)
              if (takeFault(faultAmbiguousPuts, faultAmbiguousPuts = _)) {
                // the effect LANDED but the response dies mid-flight —
                // the client sees a connection error and must resolve
                // the ambiguity itself (retry -> its own 412)
                ex.close(); return
              }
              ex.getResponseHeaders.set("ETag", s""""${md5(body)}"""")
              respond(ex, 200)
            } catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                respond(ex, 412) // Precondition Failed — the loser's answer
            }
          } else {
            // all-or-nothing replace: stage + atomic move, the way a
            // completed upload becomes visible at once
            val tmp = Files.createTempFile(f.getParent, ".upload_", ".tmp")
            try {
              Files.write(tmp, body)
              Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING,
                StandardCopyOption.ATOMIC_MOVE)
            } finally Files.deleteIfExists(tmp)
            ex.getResponseHeaders.set("ETag", s""""${md5(body)}"""")
            respond(ex, 200)
          }
      }
    }

    private def copyResultXml(etag: String): Array[Byte] =
      s"""<?xml version="1.0"?><CopyObjectResult><ETag>"$etag"</ETag></CopyObjectResult>"""
        .getBytes(UTF_8)

    private def handleList(ex: HttpExchange, params: Map[String, String]): Unit = {
      val prefix = params.getOrElse("prefix", "")
      val token = params.get("continuation-token")
      val root = Paths.get(prefix.stripSuffix("/"))
      if (!jailed(root)) { respond(ex, 403); return }
      val all: Seq[String] =
        if (!Files.isDirectory(root)) Seq.empty
        else {
          val s = Files.walk(root)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.filter(Files.isRegularFile(_))
              .map(_.toString)
              .filter(k => k.startsWith(prefix) &&
                !k.substring(k.lastIndexOf('/') + 1).startsWith(".upload_"))
              .toList.sorted
          } finally s.close()
        }
      // stale page: a listing lagging behind writes is missing its
      // NEWEST key (for manifest logs the lexicographic max IS the
      // newest version)
      val visible =
        if (takeFault(staleListDrops, staleListDrops = _)) all.dropRight(1) else all
      // lexicographic pagination after the continuation token, exactly
      // MaxKeys per page — real listings always take the token loop
      val after = token.fold(visible)(t => visible.dropWhile(_ <= t))
      val page = after.take(MaxKeys)
      val truncated = after.size > MaxKeys
      val xml = new StringBuilder
      xml ++= """<?xml version="1.0"?><ListBucketResult>"""
      xml ++= s"<IsTruncated>$truncated</IsTruncated><MaxKeys>$MaxKeys</MaxKeys>"
      page.foreach { k =>
        xml ++= s"<Contents><Key>${scala.xml.Utility.escape(k)}</Key></Contents>"
      }
      if (truncated)
        xml ++= s"<NextContinuationToken>${scala.xml.Utility.escape(page.last)}</NextContinuationToken>"
      xml ++= "</ListBucketResult>"
      respond(ex, 200, xml.toString.getBytes(UTF_8))
    }
  }

  /** [[ObjectApi]] over pure HTTP — what a vendor-SDK implementation
    * looks like at the wire: conditional create is `If-None-Match: *`
    * (412 = CAS loss), existence/size/mtime come from a ranged GET's
    * `Content-Range` total, copy is `x-amz-copy-source`, touch is the
    * metadata self-copy, listing walks ListObjectsV2 continuation
    * tokens. Keys are `<scheme>:<abs path>` strings (the CommitIo path
    * shape); the scheme prefix is stripped and the path URL-encoded per
    * segment.
    */
  final class HttpObjectApi(base: String) extends ObjectApi {
    private val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()

    private def pathOf(key: String): String = key.dropWhile(_ != ':').drop(1)

    private def urlOf(key: String): URI = {
      val enc = pathOf(key).split('/').map(seg =>
        URLEncoder.encode(seg, UTF_8).replace("+", "%20")).mkString("/")
      URI.create(s"$base$enc")
    }

    private val MaxRetries = 4

    /** The SDK retry policy every production object-store client ships:
      * 503 (throttling) and connection errors back off and retry —
      * every operation here is either naturally idempotent (GET, HEAD,
      * LIST, DELETE, full PUT, COPY) or made safe by its condition
      * (`If-None-Match` — see [[putIfNoneMatch]]'s ambiguity
      * resolution). A request that keeps failing past the budget
      * surfaces the last error.
      */
    private def send(rb: => HttpRequest.Builder): HttpResponse[Array[Byte]] = {
      var attempt = 0
      while (true) {
        val r =
          try client.send(rb.build(), HttpResponse.BodyHandlers.ofByteArray())
          catch {
            case e: IOException =>
              if (attempt >= MaxRetries) throw e
              null
          }
        if (r != null && r.statusCode() != 503) return r
        if (r != null && attempt >= MaxRetries) return r
        attempt += 1
        Thread.sleep(10L << attempt)
      }
      throw new IllegalStateException("unreachable")
    }

    override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
      // AMBIGUOUS-SUCCESS resolution: a conditional PUT whose connection
      // died mid-response may or may not have landed server-side. The
      // retry then sees 412 — possibly from our OWN object. Disambiguate
      // the way production commit clients do: read the object back and
      // compare content; equal bytes = we won (and manifest bytes embed
      // a writer timestamp, so two different writers' payloads for one
      // version are never byte-equal in practice).
      var sawConnError = false
      var attempt = 0
      while (true) {
        val r =
          try client.send(HttpRequest.newBuilder(urlOf(key))
            .header("If-None-Match", "*")
            .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes)).build(),
            HttpResponse.BodyHandlers.ofByteArray())
          catch {
            case e: IOException =>
              if (attempt >= MaxRetries) throw e
              sawConnError = true
              null
          }
        if (r != null) r.statusCode() match {
          case 200 => return true
          case 412 =>
            return sawConnError && java.util.Arrays.equals(get(key), bytes)
          case 503 if attempt < MaxRetries => ()
          case c => throw new IOException(s"conditional PUT $key -> HTTP $c")
        }
        attempt += 1
        Thread.sleep(10L << attempt)
      }
      throw new IllegalStateException("unreachable")
    }

    override def put(key: String, bytes: Array[Byte]): Unit = {
      val r = send(HttpRequest.newBuilder(urlOf(key))
        .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes)))
      if (r.statusCode() != 200)
        throw new IOException(s"PUT $key -> HTTP ${r.statusCode()}")
    }

    override def get(key: String): Array[Byte] = {
      val r = send(HttpRequest.newBuilder(urlOf(key)).GET())
      r.statusCode() match {
        case 200 => r.body()
        case 404 => throw new java.io.FileNotFoundException(s"no object at $key")
        case c => throw new IOException(s"GET $key -> HTTP $c")
      }
    }

    override def head(key: String): Option[ObjectApi.Head] = {
      // ranged GET instead of HEAD: the 206's Content-Range carries the
      // total size, Last-Modified the mtime — one round trip, no body
      val r = send(HttpRequest.newBuilder(urlOf(key))
        .header("Range", "bytes=0-0").GET())
      r.statusCode() match {
        case 206 | 416 =>
          val total = r.headers().firstValue("Content-Range").orElse("")
            .split('/').last.toLong
          val mtime = r.headers().firstValue("x-amz-meta-mtime-ms")
            .map[Long](_.toLong)
            .orElseGet(() => r.headers().firstValue("Last-Modified")
              .map[Long](v => java.time.ZonedDateTime.parse(v, Rfc1123)
                .toInstant.toEpochMilli)
              .orElse(0L))
          Some(ObjectApi.Head(total, mtime))
        case 404 => None
        case c => throw new IOException(s"ranged GET $key -> HTTP $c")
      }
    }

    override def delete(key: String): Unit = {
      val r = send(HttpRequest.newBuilder(urlOf(key)).DELETE())
      if (r.statusCode() != 204 && r.statusCode() != 404)
        throw new IOException(s"DELETE $key -> HTTP ${r.statusCode()}")
    }

    override def copy(src: String, dst: String): Unit = {
      val r = send(HttpRequest.newBuilder(urlOf(dst))
        .header("x-amz-copy-source", pathOf(src))
        .PUT(HttpRequest.BodyPublishers.noBody()))
      if (r.statusCode() != 200)
        throw new IOException(s"COPY $src -> $dst: HTTP ${r.statusCode()}")
    }

    override def touch(key: String): Unit = {
      val r = send(HttpRequest.newBuilder(urlOf(key))
        .header("x-amz-copy-source", pathOf(key))
        .header("x-amz-metadata-directive", "REPLACE")
        .PUT(HttpRequest.BodyPublishers.noBody()))
      if (r.statusCode() == 404)
        throw new java.io.FileNotFoundException(s"no object at $key")
      if (r.statusCode() != 200)
        throw new IOException(s"touch $key -> HTTP ${r.statusCode()}")
    }

    override def listPrefix(prefix: String): Seq[String] = {
      val scheme = prefix.takeWhile(_ != ':')
      val raw = pathOf(prefix)
      val out = Seq.newBuilder[String]
      var token: Option[String] = None
      var more = true
      while (more) {
        val q = s"list-type=2&prefix=${URLEncoder.encode(raw, UTF_8)}" +
          token.fold("")(t => s"&continuation-token=${URLEncoder.encode(t, UTF_8)}")
        val r = send(HttpRequest.newBuilder(URI.create(s"$base/?$q")).GET())
        if (r.statusCode() != 200)
          throw new IOException(s"LIST $prefix -> HTTP ${r.statusCode()}")
        val xml = new String(r.body(), UTF_8)
        "<Key>(.*?)</Key>".r.findAllMatchIn(xml).foreach { m =>
          out += s"$scheme:${unescapeXml(m.group(1))}"
        }
        token = "<NextContinuationToken>(.*?)</NextContinuationToken>".r
          .findFirstMatchIn(xml).map(m => unescapeXml(m.group(1)))
        more = token.isDefined
      }
      out.result()
    }

    private def unescapeXml(s: String): String =
      s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&apos;", "'").replace("&amp;", "&")
  }
}
