package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC (Web ARChive, ISO 28500) reader — the standard container for web
 * crawls and hence the front door of a large-scale text-curation pipeline
 * (Common Crawl ships WARC/WET/WAT in exactly this framing).
 *
 * Beyond the reference's surface (rdf-fusion has no crawl-ingestion layer);
 * this slots in front of the `documents`-table operators (HTML extraction,
 * quality filtering, dedup) as the raw-bytes ingestion step.
 *
 * Format essentials implemented here:
 *   - records are `WARC/1.x` header blocks (CRLF lines, `Name: value`
 *     fields) terminated by an empty line, followed by exactly
 *     `Content-Length` payload bytes, then CRLF CRLF;
 *   - records concatenate back-to-back in one file;
 *   - files are optionally gzip with ONE MEMBER PER RECORD (the spec's
 *     recommended layout) — the JDK's `GZIPInputStream` reads concatenated
 *     members transparently, so both plain and record-gzipped files take
 *     the same walk;
 *   - `response` records carry an HTTP/1.1 message as payload
 *     (`Content-Type: application/http`): status line + headers + body.
 *
 * Distribution shape: WARC is NOT line-splittable (payloads are arbitrary
 * bytes, record boundaries are only discoverable by walking lengths), so
 * the honest parallel unit is the FILE — same posture as the Turtle/RDF-XML
 * readers ([[Turtle]]): `binaryFile` source, one file per task, record
 * fan-out inside the task. Crawl archives arrive as many ~1 GB segment
 * files, so file-level parallelism saturates a cluster. The per-record
 * parse is a narrow transform; nothing shuffles.
 */
object Warc {

  /** One parsed WARC record. `target_uri`/`http_*` are null where the
    * record type doesn't carry them (e.g. warcinfo). `body` is the HTTP
    * message body for `application/http` payloads, the raw payload
    * otherwise, decoded as UTF-8. */
  final case class WarcRow(
      source: String, record_ord: Int, warc_type: String, record_id: String,
      warc_date: String, target_uri: String, content_type: String,
      content_length: Long, http_status: Integer, http_content_type: String,
      body: String)

  private val rowEnc = Encoders.product[WarcRow]

  /** Walk every record in one (possibly record-gzipped) WARC blob. */
  private[graft] def parseRecords(source: String, raw: Array[Byte]): Seq[WarcRow] = {
    if (raw == null || raw.length < 4) return Nil
    val bytes =
      if ((raw(0) & 0xFF) == 0x1f && (raw(1) & 0xFF) == 0x8b) gunzipAll(raw)
      else raw
    val out = Seq.newBuilder[WarcRow]
    var pos = 0
    var ord = 0
    while (pos < bytes.length) {
      // Skip inter-record CRLFs (the spec mandates two after each payload).
      while (pos < bytes.length &&
             (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) return out.result()
      val headerEnd = indexOfBlankLine(bytes, pos)
      if (headerEnd < 0)
        throw new IllegalArgumentException(
          s"$source: unterminated WARC header block at offset $pos")
      val header = new String(bytes, pos, headerEnd - pos, UTF_8)
      val lines = header.split("\r\n").toSeq
      if (lines.isEmpty || !lines.head.startsWith("WARC/"))
        throw new IllegalArgumentException(
          s"$source: expected WARC/1.x version line at offset $pos, got '${lines.headOption.getOrElse("")}'")
      val fields = parseFields(lines.tail)
      val len = fields.get("content-length").map(_.trim.toLong).getOrElse(
        throw new IllegalArgumentException(s"$source: record without Content-Length at offset $pos"))
      val payloadStart = headerEnd + 4 // past CRLF CRLF
      // Long-space validation before any Int math (same DoS posture as the
      // WAV/AIFF/AU chunk walks): a hostile length must not wrap.
      if (len < 0 || payloadStart.toLong + len > bytes.length.toLong)
        throw new IllegalArgumentException(
          s"$source: Content-Length $len overruns file (offset $pos)")
      val payload = java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len.toInt)
      val ctype = fields.getOrElse("content-type", null)
      val (status, httpCt, body) =
        if (ctype != null && ctype.toLowerCase.startsWith("application/http"))
          parseHttp(payload)
        else (null: Integer, null: String, new String(payload, UTF_8))
      out += WarcRow(
        source = source, record_ord = ord,
        warc_type = fields.getOrElse("warc-type", null),
        record_id = fields.getOrElse("warc-record-id", null),
        warc_date = fields.getOrElse("warc-date", null),
        target_uri = fields.getOrElse("warc-target-uri", null),
        content_type = ctype, content_length = len,
        http_status = status, http_content_type = httpCt, body = body)
      ord += 1
      pos = payloadStart + len.toInt
    }
    out.result()
  }

  /** HTTP/1.1 message payload: status line, headers, blank line, body. */
  private def parseHttp(payload: Array[Byte]): (Integer, String, String) = {
    val blank = indexOfBlankLine(payload, 0)
    if (blank < 0) return (null, null, new String(payload, UTF_8))
    val head = new String(payload, 0, blank, UTF_8)
    val lines = head.split("\r\n").toSeq
    val status: Integer = lines.head.split(" ") match {
      case parts if parts.length >= 2 && parts(0).startsWith("HTTP/") =>
        try Integer.valueOf(parts(1).toInt) catch { case _: NumberFormatException => null }
      case _ => null
    }
    val fields = parseFields(lines.tail)
    val body = new String(payload, blank + 4, payload.length - blank - 4, UTF_8)
    (status, fields.getOrElse("content-type", null), body)
  }

  /** `Name: value` field lines → lower-cased-name map (field names are
    * case-insensitive per the spec; last occurrence wins). */
  private def parseFields(lines: Seq[String]): Map[String, String] =
    lines.iterator.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap

  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Inflate ALL concatenated gzip members (the JDK reader consumes
    * multi-member streams transparently). */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(raw), 65536)
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  // ------------------------------------------------------------------ API

  /** Read WARC files under `path` (plain or `.warc.gz`), one file per task,
    * one row per record. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseRecords(p, bytes) }(rowEnc)
      .toDF()
  }

  /** Streaming variant of [[read]]: new `.warc`/`.warc.gz` files landing
    * under `dir` are parsed per micro-batch — continuous crawl ingestion
    * (a fetcher fleet drops segment files; this side never backs up because
    * the per-file parse is a narrow transform). Standard file-source
    * options (`maxFilesPerTrigger`, globs, archiving) apply downstream of
    * here, and the quality/dedup streaming ops compose on the result. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .schema(new org.apache.spark.sql.types.StructType()
        .add("path", "string").add("modificationTime", "timestamp")
        .add("length", "long").add("content", "binary"))
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseRecords(p, bytes) }(rowEnc)
      .toDF()
  }

  /** Parse a binary column of WARC blobs already in a DataFrame (e.g. out
    * of a message queue or a parquet staging table): one row per record,
    * narrow transform. `idCol` labels the `source` column. */
  def records(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
    ds.flatMap { case (id, bytes) => parseRecords(id, bytes) }(rowEnc).toDF()
  }

  // ------------------------------------------------- deterministic synthesis

  /** Build a valid two-record WARC blob (warcinfo + HTTP response) from a
    * document row, gzipping every other doc's blob as ONE MEMBER PER RECORD
    * so both the plain and gzip walks are exercised. The response body is
    * the document's own text, so the gate verifies real payload integrity,
    * not just framing. */
  private[graft] def syntheticWarcBytes(id: Long, text: String): Array[Byte] = {
    val info = record(
      Seq("WARC-Type: warcinfo",
        s"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-${"%012d".format(id)}>",
        "WARC-Date: 2026-01-01T00:00:00Z",
        "Content-Type: application/warc-fields"),
      s"software: graft/0.6\r\nhostname: crawler-${id % 7}\r\n".getBytes(UTF_8))
    val body = if (text == null) "" else text
    val httpBytes = {
      val b = body.getBytes(UTF_8)
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\nContent-Length: ${b.length}\r\n\r\n"
      head.getBytes(UTF_8) ++ b
    }
    val resp = record(
      Seq("WARC-Type: response",
        s"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0001-${"%012d".format(id)}>",
        "WARC-Date: 2026-01-01T00:00:00Z",
        s"WARC-Target-URI: http://example.org/doc/$id",
        "Content-Type: application/http; msgtype=response"),
      httpBytes)
    if (id % 2 == 0) info ++ resp else gzip(info) ++ gzip(resp)
  }

  private def record(fields: Seq[String], payload: Array[Byte]): Array[Byte] = {
    val head = ("WARC/1.0" +: fields :+ s"Content-Length: ${payload.length}")
      .mkString("", "\r\n", "\r\n\r\n")
    head.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    val gz = new GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }

  /** documents(doc_id, text) → (doc_id, warc) with a valid synthetic blob
    * per row. */
  def syntheticWarc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    ds.map { case (id, text) => (id, syntheticWarcBytes(id, text)) }(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "warc")
  }
}
