package graft

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Row
import graft.engine.Results
import graft.sources.NTriples
import graft.web.SparqlServer

/**
 * Solution-format streaming (VERDICT r4 item 2): SELECT responses go out
 * chunked, rendered by the per-row line renderers partition by partition —
 * the driver never holds the whole document. Proven two ways: no
 * Content-Length on any solution format, and time-to-first-byte beating a
 * deliberately slow last partition (bytes arrive while Spark is still
 * computing the tail of the result).
 */
class SparqlServerStreamingSpec extends SparkSpec {

  private def enc(s: String) = URLEncoder.encode(s, UTF_8)

  /** (status, contentLengthHeader, firstByteMillis, body) reading the
    * response incrementally. */
  private def get(url: String, accept: String): (Int, Option[String], Long, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setRequestProperty("Accept", accept)
    val t0 = System.nanoTime()
    val status = conn.getResponseCode
    val in = conn.getInputStream
    val first = in.read()
    val firstByteMs = (System.nanoTime() - t0) / 1000000
    val rest = in.readAllBytes()
    val body = new String((first.toByte +: rest.toSeq).toArray, UTF_8)
    (status, Option(conn.getHeaderField("Content-Length")), firstByteMs, body)
  }

  test("all four solution formats stream chunked and round-trip a 30k-row result") {
    val n = 30000
    val nt = (0 until n).map(i => s"""<urn:s$i> <urn:p> "v$i" .""").mkString("\n")
    val server = SparqlServer.start(spark, NTriples.fromString(spark, nt)
      .withColumn("graph", org.apache.spark.sql.functions.lit(null)
        .cast(graft.encoding.TermCols.schema))
      .select("graph", "subject", "predicate", "object"))
    try {
      val url = s"http://127.0.0.1:${server.boundPort}/repositories/default/query?query=" +
        enc("SELECT ?s ?o WHERE { ?s <urn:p> ?o }")
      val (stJ, clJ, _, json) = get(url, "application/sparql-results+json")
      assert(stJ == 200 && clJ.isEmpty, "json must be chunked (no Content-Length)")
      val Results.ReadSolutions(_, jRows) = Results.readJson(json): @unchecked
      assert(jRows.size == n)
      val (stX, clX, _, xml) = get(url, "application/sparql-results+xml")
      assert(stX == 200 && clX.isEmpty)
      assert(xml.sliding(8).count(_ == "<result>") == n)
      assert(xml.startsWith("<?xml") && xml.endsWith("</sparql>\n"))
      val (stC, clC, _, csv) = get(url, "text/csv")
      assert(stC == 200 && clC.isEmpty)
      assert(csv.linesIterator.size == n + 1)
      val (stT, clT, _, tsv) = get(url, "text/tsv")
      assert(stT == 200 && clT.isEmpty)
      val Results.ReadSolutions(_, tRows) = Results.readTsv(tsv): @unchecked
      assert(tRows.size == n)
    } finally server.stop()
  }

  test("concurrent requests are served in parallel, all correct") {
    val nt = (0 until 2000).map(i => s"""<urn:s$i> <urn:p${i % 4}> "v$i" .""").mkString("\n")
    val server = SparqlServer.start(spark, NTriples.fromString(spark, nt)
      .withColumn("graph", org.apache.spark.sql.functions.lit(null)
        .cast(graft.encoding.TermCols.schema))
      .select("graph", "subject", "predicate", "object"))
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val futures = (0 until 4).map { p =>
        Future {
          val url = s"http://127.0.0.1:${server.boundPort}/repositories/default/query?query=" +
            enc(s"SELECT ?s WHERE { ?s <urn:p$p> ?o }")
          val (st, _, _, body) = get(url, "text/csv")
          (p, st, body.linesIterator.size - 1)
        }
      }
      val results = Await.result(Future.sequence(futures), 120.seconds)
      results.foreach { case (p, st, rows) =>
        assert(st == 200 && rows == 500, s"predicate p$p: status=$st rows=$rows")
      }
    } finally server.stop()
  }

  test("first bytes arrive while the last partition is still computing") {
    // enough rows that the fast partitions overflow the server's 64 KiB
    // write buffer — the first chunk must hit the wire mid-computation
    val nt = (0 until 40000).map(i => s"""<urn:s$i> <urn:p> "v$i" .""").mkString("\n")
    val base = NTriples.fromString(spark, nt)
      .withColumn("graph", org.apache.spark.sql.functions.lit(null)
        .cast(graft.encoding.TermCols.schema))
      .select("graph", "subject", "predicate", "object")
      .repartition(4)
    val schema = base.schema
    val slowMs = 6000L
    val slowRdd = base.rdd.mapPartitionsWithIndex { (i, it) =>
      if (i == 3) { Thread.sleep(slowMs); it } else it
    }
    val slow = spark.createDataFrame(slowRdd, schema)
    val server = SparqlServer.start(spark, slow)
    try {
      val url = s"http://127.0.0.1:${server.boundPort}/repositories/default/query?query=" +
        enc("SELECT ?s ?o WHERE { ?s <urn:p> ?o }")
      val t0 = System.nanoTime()
      val (st, _, firstByteMs, body) = get(url, "text/csv")
      val totalMs = (System.nanoTime() - t0) / 1000000
      assert(st == 200)
      assert(body.linesIterator.size == 40001)
      // the whole response can't finish before the slow partition; the first
      // byte must beat it by a wide margin — i.e. it streamed
      assert(totalMs >= slowMs, s"total=$totalMs")
      assert(firstByteMs < slowMs - 1000, s"firstByte=$firstByteMs — response was buffered, not streamed")
    } finally server.stop()
  }
}
