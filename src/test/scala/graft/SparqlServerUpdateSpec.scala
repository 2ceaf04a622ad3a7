package graft

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import graft.web.SparqlServer

/** SPARQL 1.1 Protocol update endpoint: POST application/sparql-update and
  * form-encoded bodies, sequencing across requests, graph registration
  * carried between requests, and error mapping. */
class SparqlServerUpdateSpec extends SparkSpec {

  private lazy val server = SparqlServer.start(spark)
  private def base = s"http://127.0.0.1:${server.boundPort}"

  override def afterAll(): Unit = {
    try server.stop() finally super.afterAll()
  }

  private def http(method: String, url: String, accept: String = null,
                   contentType: String = null, body: String = null): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    if (accept != null) conn.setRequestProperty("Accept", accept)
    if (contentType != null) conn.setRequestProperty("Content-Type", contentType)
    if (body != null) { conn.setDoOutput(true); conn.getOutputStream.write(body.getBytes(UTF_8)) }
    val status = conn.getResponseCode
    val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
    (status, if (stream == null) "" else new String(stream.readAllBytes(), UTF_8))
  }

  private def ask(q: String): Boolean = {
    val (st, body) = http("GET",
      s"$base/repositories/default/query?query=${URLEncoder.encode(q, UTF_8)}",
      accept = "application/sparql-results+json")
    assert(st == 200, body)
    body.contains("true")
  }

  test("POST sparql-update body: INSERT DATA then DELETE/INSERT WHERE") {
    val (st1, b1) = http("POST", s"$base/repositories/default/update",
      contentType = "application/sparql-update",
      body = "INSERT DATA { <urn:u:a> <urn:u:p> \"v1\" . <urn:u:b> <urn:u:p> \"v2\" }")
    assert(st1 == 204, b1)
    assert(ask("ASK { <urn:u:a> <urn:u:p> \"v1\" }"))
    val (st2, _) = http("POST", s"$base/repositories/default/update",
      contentType = "application/sparql-update",
      body = "DELETE { ?s <urn:u:p> ?o } INSERT { ?s <urn:u:q> ?o } WHERE { ?s <urn:u:p> ?o }")
    assert(st2 == 204)
    assert(!ask("ASK { ?s <urn:u:p> ?o }"))
    assert(ask("ASK { <urn:u:b> <urn:u:q> \"v2\" }"))
  }

  test("form-encoded update=, graph registration across requests, errors") {
    val upd = URLEncoder.encode("CREATE GRAPH <urn:u:g1>", UTF_8)
    val (st, b) = http("POST", s"$base/repositories/default/update",
      contentType = "application/x-www-form-urlencoded", body = s"update=$upd")
    assert(st == 204, b)
    // CREATE of the same graph in a LATER request must see the registration
    val (st2, b2) = http("POST", s"$base/repositories/default/update",
      contentType = "application/sparql-update", body = "CREATE GRAPH <urn:u:g1>")
    assert(st2 == 400 && b2.contains("already exists"))
    // parse errors → 400; wrong content type → 400; GET → 405
    assert(http("POST", s"$base/repositories/default/update",
      contentType = "application/sparql-update", body = "INSERT GARBAGE")._1 == 400)
    assert(http("POST", s"$base/repositories/default/update",
      contentType = "text/plain", body = "x")._1 == 400)
    assert(http("GET", s"$base/repositories/default/update")._1 == 405)
  }

  test("protocol using-graph-uri scopes update WHERE; combining with USING is 400") {
    // seed one named graph and one default-graph triple
    val (s0, _) = http("POST", s"$base/repositories/default/update",
      contentType = "application/sparql-update",
      body = "INSERT DATA { <urn:d:s> <urn:d:p> 1 . GRAPH <urn:d:g1> { <urn:d:gs> <urn:d:p> 2 } }")
    assert(s0 == 204)
    // using-graph-uri=g1: the WHERE sees g1 AS the default graph → copies
    // the named-graph triple, not the real default-graph one
    val (s1, b1) = http("POST",
      s"$base/repositories/default/update?using-graph-uri=${URLEncoder.encode("urn:d:g1", UTF_8)}",
      contentType = "application/sparql-update",
      body = "INSERT { ?s <urn:d:copied> ?o } WHERE { ?s <urn:d:p> ?o }")
    assert(s1 == 204, b1)
    assert(ask("ASK { <urn:d:gs> <urn:d:copied> 2 }"))
    assert(!ask("ASK { <urn:d:s> <urn:d:copied> 1 }"))
    // param + in-request USING → 400 (protocol 2.2.3)
    val (s2, b2) = http("POST",
      s"$base/repositories/default/update?using-graph-uri=${URLEncoder.encode("urn:d:g1", UTF_8)}",
      contentType = "application/sparql-update",
      body = "INSERT { ?s <urn:d:x> ?o } USING <urn:d:g1> WHERE { ?s <urn:d:p> ?o }")
    assert(s2 == 400 && b2.contains("USING"), s"$s2 $b2")
  }
}
