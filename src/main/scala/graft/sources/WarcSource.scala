package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** One parsed WARC record. `body` is the raw record payload (for
  * response records: the full HTTP message); `html` is the decoded
  * HTTP body for response records whose Content-Type says text, else
  * null. */
case class WarcRecord(warc_file: String, rec_type: String, url: String,
                      ts: java.sql.Timestamp, warc_date: String,
                      http_status: Int, content_type: String,
                      n_bytes: Long, truncated: Boolean,
                      body: Array[Byte], html: String)

/**
 * WARC (ISO 28500, the Common-Crawl container) source: record-split
 * (url, ts, html, ...) rows from `*.warc` / `*.warc.gz` files — the
 * step BEFORE q60's html column, completing the web-curation path
 * WARC -> html-extract -> URLs -> domain mix from one artifact.
 *
 * Format (public spec): a WARC file is a sequence of records, each a
 * header block (`WARC/1.x` version line + `Name: value` lines + blank
 * line), `Content-Length` payload bytes, and a blank-line separator.
 * `.warc.gz` files concatenate one gzip member per record;
 * GZIPInputStream reads concatenated members natively, so the walker
 * sees one continuous stream either way.
 *
 * Robustness carries the Media parser discipline (CLAUDE.md): declared
 * lengths CLAMP to what the stream actually holds (a corrupt
 * Content-Length cannot spin or over-allocate), payloads cap at
 * [[MaxRecordBytes]] with the remainder streamed past (record flagged
 * `truncated`), header blocks cap at [[MaxHeaderBytes]], and any
 * malformed header block ends THAT FILE's walk after the records
 * already parsed (a half-written tail never poisons the batch).
 *
 * Scale shape: one task per WARC file via binaryFiles' PortableDataStream
 * — records stream through a bounded buffer, whole files never load.
 * Common-Crawl publishes ~1 GB segment files in the thousands per
 * crawl, so file-grain parallelism IS the standard processing grain;
 * tune minPartitions only when files are few and huge.
 */
object WarcSource {
  final val MaxRecordBytes: Int = 64 << 20
  final val MaxHeaderBytes: Int = 1 << 20

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType), StructField("rec_type", StringType),
    StructField("url", StringType), StructField("ts", TimestampType),
    StructField("warc_date", StringType), StructField("http_status", IntegerType),
    StructField("content_type", StringType), StructField("n_bytes", LongType),
    StructField("truncated", BooleanType), StructField("body", BinaryType),
    StructField("html", StringType)))

  /** Batch read: every record of every WARC file under `path`. */
  def readWarc(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    val rows = spark.sparkContext.binaryFiles(path, mp).flatMap { case (file, pds) =>
      val raw = pds.open()
      val in = if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
               else new java.io.BufferedInputStream(raw, 1 << 16)
      // the iterator closes the stream at exhaustion; a task-completion
      // hook covers PARTIAL consumption (a downstream limit/take stops
      // mid-iterator and would otherwise strand the fd + gzip buffers
      // until GC in a long-lived executor). close() is idempotent.
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        try in.close() catch { case scala.util.control.NonFatal(_) => () }
      }
      parseWarcStream(in, file)
    }.map(r => Row(r.warc_file, r.rec_type, r.url, r.ts, r.warc_date,
      r.http_status, r.content_type, r.n_bytes, r.truncated, r.body, r.html))
    spark.createDataFrame(rows, schema)
  }

  /** Streaming read: the same record rows as [[readWarc]] from a
    * directory watched by Structured Streaming's file source (binaryFile
    * format; new files picked up per trigger — the Common-Crawl "new
    * segments arrive" shape). binaryFile materializes each file's bytes
    * as one row, so cap segment sizes (or maxFilesPerTrigger) to
    * executor memory; the batch path streams and has no such bound. */
  def warcStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .schema(StructType(Seq(
        StructField("path", StringType), StructField("modificationTime", TimestampType),
        StructField("length", LongType), StructField("content", BinaryType))))
      .load(dir)
    val enc = org.apache.spark.sql.Encoders.product[WarcRecord]
    files.select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val bin = new java.io.ByteArrayInputStream(bytes)
        val in = if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(bin, 1 << 16)
                 else bin: java.io.InputStream
        parseWarcStream(in, file)
      }(enc).toDF()
  }

  /** Walk one WARC stream into records; stops (after what parsed) on
    * any malformed header block. Closes `in` at exhaustion. */
  def parseWarcStream(in: java.io.InputStream, file: String): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false

      private def readLine(max: Int): String = {
        // raw ASCII line (header charset per spec); null at EOF/overrun
        val sb = new java.lang.StringBuilder
        var c = in.read()
        if (c < 0) return null
        while (c >= 0 && c != '\n') {
          if (sb.length >= max) return null
          sb.append(c.toChar)
          c = in.read()
        }
        val s = sb.toString
        if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
      }

      private def advance(): Unit = {
        nextRec = null
        if (done) return
        // skip blank separator lines between records (spec: two CRLF)
        var line = readLine(MaxHeaderBytes)
        var guard = 0
        while (line != null && line.isEmpty && guard < 8) { line = readLine(MaxHeaderBytes); guard += 1 }
        if (line == null || !line.startsWith("WARC/")) { done = true; in.close(); return }
        // header block
        val hdrs = scala.collection.mutable.Map.empty[String, String]
        var hdrBytes = 0
        var ok = true
        var h = readLine(MaxHeaderBytes)
        while (ok && h != null && h.nonEmpty) {
          hdrBytes += h.length + 2
          if (hdrBytes > MaxHeaderBytes) ok = false
          else {
            val i = h.indexOf(':')
            if (i > 0) hdrs(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
            h = readLine(MaxHeaderBytes)
          }
        }
        if (!ok || h == null) { done = true; in.close(); return }
        val declared = hdrs.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
        if (declared < 0) { done = true; in.close(); return }
        // clamped, capped payload read; stream past any capped remainder.
        // Chunked growth, never a declared-length pre-allocation: a
        // record declaring 2^40 bytes must not allocate the 64 MB cap
        // up front for a 20-byte payload (the GIF frame-descriptor-bomb
        // lesson applied to containers).
        val want = math.min(declared, MaxRecordBytes.toLong).toInt
        val acc = new java.io.ByteArrayOutputStream(math.min(want, 1 << 16))
        val chunk = new Array[Byte](1 << 16)
        var got = 0
        var n = 0
        while (got < want && n >= 0) {
          n = in.read(chunk, 0, math.min(chunk.length, want - got))
          if (n > 0) { acc.write(chunk, 0, n); got += n }
        }
        var skipped = 0L
        if (declared > want && got == want) {
          var toSkip = declared - want
          while (toSkip > 0) {
            val s = in.skip(toSkip)
            if (s <= 0) {
              // skip() can return 0 without EOF; probe with a read
              if (in.read() < 0) toSkip = 0 else { skipped += 1; toSkip -= 1 }
            } else { skipped += s; toSkip -= s }
          }
        }
        val body = acc.toByteArray
        val truncated = got < want || (declared > want && got == want)
        val recType = hdrs.getOrElse("warc-type", "")
        val url = hdrs.getOrElse("warc-target-uri", null)
        val dateRaw = hdrs.getOrElse("warc-date", null)
        val ts = if (dateRaw == null) null else
          try java.sql.Timestamp.from(java.time.Instant.parse(dateRaw))
          catch { case _: java.time.format.DateTimeParseException => null }
        var status = -1
        var ctype: String = null
        var html: String = null
        if (recType == "response" && body.length > 0) {
          // HTTP message: status line + headers + CRLFCRLF + entity body
          val split = httpHeaderEnd(body)
          if (split > 0) {
            val head = new String(body, 0, split, java.nio.charset.StandardCharsets.ISO_8859_1)
            val lines = head.split("\r\n")
            if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
              val parts = lines(0).split(" ")
              if (parts.length >= 2) status = parts(1).toIntOption.getOrElse(-1)
              lines.tail.foreach { l =>
                val i = l.indexOf(':')
                if (i > 0 && l.substring(0, i).trim.equalsIgnoreCase("content-type"))
                  ctype = l.substring(i + 1).trim
              }
              // a MISSING Content-Type does not default to textish: the
              // contract is "html when the type says text, else null" —
              // decoding an untyped 64 MB JPEG payload into a garbage
              // String would double the row and feed binary rows into
              // the html-extract path (body still carries the bytes)
              val textish = ctype != null && (ctype.toLowerCase.startsWith("text/") ||
                ctype.toLowerCase.contains("html") || ctype.toLowerCase.contains("xml"))
              if (textish)
                html = new String(body, split + 4, body.length - split - 4,
                  java.nio.charset.StandardCharsets.UTF_8)
            }
          }
        }
        nextRec = WarcRecord(file, recType, url, ts, dateRaw, status, ctype,
          got.toLong + skipped, truncated, body, html)
      }

      /** index of the first \r\n\r\n in b, or -1. */
      private def httpHeaderEnd(b: Array[Byte]): Int = {
        var i = 0
        while (i + 3 < b.length) {
          if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
          i += 1
        }
        -1
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
}
