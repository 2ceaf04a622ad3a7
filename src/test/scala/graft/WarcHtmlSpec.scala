package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.ops.Html
import graft.sources.Warc
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record walk + HTML boilerplate extraction. */
class WarcHtmlSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------------ WARC

  private def oneResponse(body: String, uri: String = "http://x.test/a"): Array[Byte] = {
    val b = body.getBytes(UTF_8)
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nContent-Length: ${b.length}\r\n\r\n"
    val payload = http.getBytes(UTF_8) ++ b
    val head = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:1>\r\n" +
      s"WARC-Target-URI: $uri\r\nContent-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  test("response record: header fields, HTTP status/type, body") {
    val rows = Warc.parseRecords("t", oneResponse("hello warc"))
    assert(rows.size == 1)
    val r = rows.head
    assert(r.warc_type == "response" && r.target_uri == "http://x.test/a")
    assert(r.http_status == 200 && r.http_content_type == "text/plain")
    assert(r.body == "hello warc" && r.record_ord == 0)
  }

  test("framing is length-based: a body containing CRLFCRLF + a fake version line does not split") {
    val hostile = "part1\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\npart2"
    val rows = Warc.parseRecords("t", oneResponse(hostile) ++ oneResponse("second"))
    assert(rows.map(_.body) == Seq(hostile, "second"))
    assert(rows.map(_.record_ord) == Seq(0, 1))
  }

  test("plain and record-gzipped blobs parse identically (multi-member gzip)") {
    val plain = Warc.syntheticWarcBytes(4L, "even doc")   // even id → plain
    val gz = Warc.syntheticWarcBytes(5L, "odd doc")       // odd id → gzip members
    assert((plain(0) & 0xFF) != 0x1f && (gz(0) & 0xFF) == 0x1f)
    val p = Warc.parseRecords("p", plain)
    val g = Warc.parseRecords("g", gz)
    assert(p.map(_.warc_type) == Seq("warcinfo", "response"))
    assert(g.map(_.warc_type) == Seq("warcinfo", "response"))
    assert(g.last.body == "odd doc" && g.last.http_status == 200)
  }

  test("non-http payload passes through raw (warcinfo)") {
    val rows = Warc.parseRecords("t", Warc.syntheticWarcBytes(2L, "x"))
    assert(rows.head.content_type == "application/warc-fields")
    assert(rows.head.body == "software: graft/0.6\r\nhostname: crawler-2\r\n")
    assert(rows.head.http_status == null && rows.head.target_uri == null)
  }

  test("hostile lengths are rejected, not wrapped") {
    val good = oneResponse("x")
    // first Content-Length line in the record is the WARC-level one
    val overrun = new String(good, UTF_8).replaceFirst("Content-Length: \\d+", "Content-Length: 9999999")
    intercept[IllegalArgumentException] {
      Warc.parseRecords("t", overrun.getBytes(UTF_8))
    }
    intercept[IllegalArgumentException] {
      Warc.parseRecords("t", "NOT-WARC/9 junk\r\n\r\n".getBytes(UTF_8))
    }
  }

  test("file read: one row per record across files, plain and gzip") {
    val dir = Files.createTempDirectory("warc").toFile
    try {
      Files.write(new java.io.File(dir, "a.warc").toPath, Warc.syntheticWarcBytes(2L, "alpha"))
      Files.write(new java.io.File(dir, "b.warc.gz").toPath, Warc.syntheticWarcBytes(3L, "beta"))
      val df = Warc.read(spark, dir.getAbsolutePath)
      val got = df.select("warc_type", "body").where(col("warc_type") === "response")
        .as[(String, String)].collect().toSet
      assert(got == Set(("response", "alpha"), ("response", "beta")))
      assert(df.count() == 4)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("streaming read: records from files landing across micro-batches") {
    val dir = Files.createTempDirectory("warcstream").toFile
    try {
      Files.write(new java.io.File(dir, "seg0.warc").toPath, Warc.syntheticWarcBytes(2L, "first batch"))
      val q = Warc.readStream(spark, dir.getAbsolutePath)
        .where(col("warc_type") === "response").select("target_uri", "body")
        .writeStream.format("memory").queryName("warc_stream").outputMode("append").start()
      try {
        q.processAllAvailable()
        Files.write(new java.io.File(dir, "seg1.warc.gz").toPath, Warc.syntheticWarcBytes(3L, "second batch"))
        q.processAllAvailable()
        val got = spark.table("warc_stream").as[(String, String)].collect().toSet
        assert(got == Set(("http://example.org/doc/2", "first batch"),
                          ("http://example.org/doc/3", "second batch")))
      } finally q.stop()
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  // ------------------------------------------------------------------ HTML

  private def text(html: String): String = {
    Seq(Tuple1(html)).toDF("h").select(Html.textOf(col("h")).as("t"))
      .collect().head.getString(0)
  }

  test("script/style bodies vanish even when they contain markup-shaped strings") {
    assert(text("""<p>a</p><script>var x = "<p>no</p>"; if (1 < 2) {}</script><p>b</p>""") == "a b")
    assert(text("<style>p { color: red; }</style>hi") == "hi")
  }

  test("comments go before tag stripping (tags inside comments)") {
    assert(text("x<!-- <p>hidden</p> \n multi-line -->y") == "x y")
  }

  test("entities decode AFTER tag strip, &amp; last — markup-in-text stays text") {
    assert(text("<p>&lt;b&gt;not bold&lt;/b&gt;</p>") == "<b>not bold</b>")
    assert(text("&amp;lt;") == "&lt;") // NOT '<' — double-encoded stays single-encoded
    assert(text("a&nbsp;b &quot;q&quot; &#39;s") == "a b \"q\" 's")
  }

  test("whitespace collapses; unterminated trailing tag survives as text") {
    assert(text("<p>a\n\n   b\t c</p>") == "a b c")
    assert(text("done <p") == "done <p")
  }

  test("extract: title, link count, text ratio") {
    val df = Seq((1L, "<html><head><title>T1</title></head><body><a href=\"/x\">x</a> <a\nhref=\"/y\">y</a> body</body></html>"))
      .toDF("doc_id", "html")
    val r = Html.extract(df, "doc_id", "html").collect().head
    assert(r.getString(1) == "T1")
    assert(r.getString(2) == "T1 x y body")
    assert(r.getInt(3) == 2)
    assert(r.getDouble(4) > 0 && r.getDouble(4) < 1)
  }

  test("synthetic page round-trip: boilerplate out, document text in") {
    val df = Html.syntheticPage(Seq((7L, "the payload text")).toDF("doc_id", "text"), "doc_id", "text")
    val r = Html.extract(df, "doc_id", "html").collect().head
    assert(r.getString(1) == "Doc 7 &amp; friends")
    assert(r.getString(2).contains("the payload text"))
    assert(r.getString(2).contains("<b>bold</b> \"quoted\" 's"))
    assert(!r.getString(2).contains("not text") && !r.getString(2).contains("color"))
    assert(r.getInt(3) == 3)
  }
}
