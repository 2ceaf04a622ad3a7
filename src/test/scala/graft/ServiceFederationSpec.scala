package graft

import graft.engine.Graft
import graft.sources.NTriples
import graft.web.SparqlServer

/** SERVICE federation end-to-end: a Graft engine federates a BGP block to a
  * live SparqlServer over HTTP and joins the remote solutions with local
  * patterns. SILENT and unsupported-shape fallbacks keep the reference's
  * observable behaviour. */
class ServiceFederationSpec extends SparkSpec {

  // remote store behind an HTTP endpoint
  private lazy val server = SparqlServer.start(spark, NTriples.fromString(spark,
    """<urn:a> <urn:name> "alice" .
      |<urn:b> <urn:name> "bob" .
      |<urn:a> <urn:knows> <urn:b> .
      |""".stripMargin))
  private def endpoint = s"http://127.0.0.1:${server.boundPort}/repositories/default/query"

  // local store with different facts about the same resources
  private lazy val local = Graft(NTriples.fromString(spark,
    """<urn:a> <urn:age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
      |<urn:b> <urn:age> "40"^^<http://www.w3.org/2001/XMLSchema#integer> .
      |<urn:c> <urn:age> "50"^^<http://www.w3.org/2001/XMLSchema#integer> .
      |""".stripMargin))

  override def afterAll(): Unit = {
    try server.stop() finally super.afterAll()
  }

  test("SERVICE joins remote solutions with local patterns") {
    val df = local.select(
      s"""SELECT ?s ?n ?a WHERE {
         |  ?s <urn:age> ?a .
         |  SERVICE <$endpoint> { ?s <urn:name> ?n }
         |} ORDER BY ?s""".stripMargin)
    assert(rows(df, "s", "n", "a") == Set(
      Seq("urn:a", "alice", "30"), Seq("urn:b", "bob", "40")))
  }

  test("SERVICE with a multi-pattern body executes remotely") {
    val df = local.select(
      s"""SELECT ?x ?y WHERE {
         |  SERVICE <$endpoint> { ?x <urn:knows> ?y . ?y <urn:name> "bob" }
         |}""".stripMargin)
    assert(rows(df, "x", "y") == Set(Seq("urn:a", "urn:b")))
  }

  test("SERVICE SILENT with unreachable endpoint yields the empty relation") {
    val df = local.select(
      """SELECT ?s ?n WHERE {
        |  ?s <urn:age> ?a .
        |  SERVICE SILENT <http://127.0.0.1:9/nope> { ?s <urn:name> ?n }
        |}""".stripMargin)
    assert(df.count() == 0)
  }

  test("non-SILENT SERVICE with unreachable endpoint errors") {
    intercept[Exception] {
      local.select(
        """SELECT ?n WHERE {
          |  SERVICE <http://127.0.0.1:9/nope> { ?s <urn:name> ?n }
          |}""".stripMargin).collect()
    }
  }

  test("sub-select SERVICE body executes remotely") {
    val df = local.select(
      s"""SELECT ?s ?n WHERE {
         |  SERVICE <$endpoint> { SELECT ?s ?n WHERE { ?s <urn:name> ?n } }
         |}""".stripMargin)
    assert(rows(df, "s", "n") == Set(Seq("urn:a", "alice"), Seq("urn:b", "bob")))
  }

  test("aggregating sub-select SERVICE body executes remotely") {
    val df = local.select(
      s"""SELECT ?s ?k WHERE {
         |  SERVICE <$endpoint> {
         |    SELECT ?s (COUNT(?o) AS ?k) WHERE { ?s <urn:knows> ?o } GROUP BY ?s
         |  }
         |}""".stripMargin)
    assert(rows(df, "s", "k") == Set(Seq("urn:a", "1")))
  }

  test("literal terms round-trip through the serialised body") {
    val df = local.select(
      s"""SELECT ?x WHERE {
         |  SERVICE <$endpoint> { ?x <urn:name> "alice" }
         |}""".stripMargin)
    assert(rows(df, "x") == Set(Seq("urn:a")))
  }

  test("FILTER inside the SERVICE body is pushed to the endpoint") {
    val df = local.select(
      s"""SELECT ?s ?n WHERE {
         |  SERVICE <$endpoint> { ?s <urn:name> ?n . FILTER(?n = "alice" || STRLEN(?n) > 5) }
         |}""".stripMargin)
    assert(rows(df, "s", "n") == Set(Seq("urn:a", "alice")))
  }

  test("UNION body executes remotely") {
    val df = local.select(
      s"""SELECT ?x WHERE {
         |  SERVICE <$endpoint> {
         |    { ?x <urn:name> "alice" } UNION { ?x <urn:name> "bob" }
         |  }
         |}""".stripMargin)
    assert(rows(df, "x") == Set(Seq("urn:a"), Seq("urn:b")))
  }

  test("OPTIONAL body keeps unbound remote solutions joinable") {
    val df = local.select(
      s"""SELECT ?s ?n ?o WHERE {
         |  SERVICE <$endpoint> { ?s <urn:name> ?n OPTIONAL { ?s <urn:knows> ?o } }
         |}""".stripMargin)
    // a knows b; b knows nobody -> ?o unbound for b
    assert(rows(df, "s", "n", "o") == Set(
      Seq("urn:a", "alice", "urn:b"), Seq("urn:b", "bob", "∅")))
  }

  test("EXISTS filter inside the SERVICE body executes remotely") {
    val df = local.select(
      s"""SELECT ?s ?n WHERE {
         |  SERVICE <$endpoint> { ?s <urn:name> ?n .
         |                        FILTER(EXISTS { ?s <urn:knows> ?o }) }
         |}""".stripMargin)
    assert(rows(df, "s", "n") == Set(Seq("urn:a", "alice")))
  }

  test("NOT EXISTS / IF / COALESCE in the SERVICE body execute remotely") {
    val df = local.select(
      s"""SELECT ?s ?tag WHERE {
         |  SERVICE <$endpoint> {
         |    ?s <urn:name> ?n .
         |    FILTER(NOT EXISTS { ?x <urn:knows> ?s })
         |    BIND(IF(COALESCE(?n, "?") = "alice", "A", "other") AS ?tag)
         |  }
         |}""".stripMargin)
    assert(rows(df, "s", "tag") == Set(Seq("urn:a", "A")))
  }

  test("MINUS and VALUES in the SERVICE body execute remotely") {
    val df = local.select(
      s"""SELECT ?s WHERE {
         |  SERVICE <$endpoint> {
         |    ?s <urn:name> ?n .
         |    MINUS { VALUES ?s { <urn:b> } }
         |  }
         |}""".stripMargin)
    assert(rows(df, "s") == Set(Seq("urn:a")))
  }

  test("property-path SERVICE body executes remotely") {
    val df = local.select(
      s"""SELECT ?n WHERE {
         |  SERVICE <$endpoint> { <urn:a> (<urn:knows>/<urn:name>) ?n }
         |}""".stripMargin)
    assert(rows(df, "n") == Set(Seq("bob")))
  }

  test("variable endpoint behaves as the empty relation (lazily-erroring parity)") {
    // matches the reference's observable behaviour pinned by
    // oxigraph-tests ask_{union,join}_error_*
    val df = local.select(
      """SELECT ?n WHERE {
        |  ?s <urn:age> ?a .
        |  SERVICE ?ep { ?s <urn:name> ?n }
        |}""".stripMargin)
    assert(df.count() == 0)
  }

  test("non-SILENT unserialisable body on a real endpoint errors loudly") {
    intercept[UnsupportedOperationException] {
      local.select(
        s"""SELECT ?n WHERE {
           |  SERVICE <$endpoint> { ?s <urn:name> ?n . FILTER(<urn:fn:custom>(?n)) }
           |}""".stripMargin).collect()
    }
  }

  test("SILENT unserialisable body on a real endpoint yields the empty relation") {
    // same body that errors loudly without SILENT (previous test): SILENT
    // must swallow the serialisation failure, not just transport failures
    val df = local.select(
      s"""SELECT ?s ?a ?n WHERE {
         |  ?s <urn:age> ?a .
         |  SERVICE SILENT <$endpoint> { ?s <urn:name> ?n . FILTER(<urn:fn:custom>(?n)) }
         |}""".stripMargin)
    assert(df.count() == 0)
  }

  test("aggregating sub-select round-trips values and datatypes exactly") {
    // second engine instance over typed numeric data: the federated result
    // must equal evaluating the same sub-select directly — value AND
    // datatype (integer SUM stays integer, AVG becomes decimal) — proving
    // the results-format round-trip loses nothing
    val quads = NTriples.fromString(spark,
      """<urn:x> <urn:v> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |<urn:x> <urn:v> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |<urn:y> <urn:v> "2.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
        |<urn:y> <urn:v> "0.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
        |""".stripMargin)
    val server2 = SparqlServer.start(spark, quads)
    try {
      val sub =
        """SELECT ?s (SUM(?v) AS ?total) (AVG(?v) AS ?mean) (COUNT(?v) AS ?k)
          |WHERE { ?s <urn:v> ?v } GROUP BY ?s""".stripMargin
      def termPairs(df: org.apache.spark.sql.DataFrame): Set[Seq[(String, String)]] =
        df.collect().toSet[org.apache.spark.sql.Row].map { r =>
          (0 until r.size).map { i =>
            val st = r.getStruct(i)
            (st.getString(1), Option(st.getString(2)).getOrElse("∅"))
          }
        }
      val federated = local.select(
        s"""SELECT ?s ?total ?mean ?k WHERE {
           |  SERVICE <http://127.0.0.1:${server2.boundPort}/repositories/default/query>
           |    { $sub }
           |}""".stripMargin)
      val direct = Graft(quads).select(sub)
        .select("s", "total", "mean", "k")
      assert(termPairs(federated) == termPairs(direct))
      assert(federated.count() == 2)
    } finally server2.stop()
  }

  test("a user variable that merely looks like a bnode placeholder survives") {
    val df = local.select(
      s"""SELECT ?__bn_x WHERE {
         |  SERVICE <$endpoint> { ?__bn_x <urn:name> "alice" }
         |}""".stripMargin)
    assert(rows(df, "__bn_x") == Set(Seq("urn:a")))
  }
}
