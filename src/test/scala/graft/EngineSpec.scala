package graft

import graft.engine.Graft
import graft.sources.NTriples

/** End-to-end SPARQL evaluation over small in-memory graphs.
  * Data shapes mirror the reference's oxigraph-tests regression corpus
  * (/root/reference/testsuite/oxigraph-tests/sparql/). */
class EngineSpec extends SparkSpec {

  private val EX = "http://ex.org/"

  lazy val g: Graft = Graft(NTriples.fromString(spark,
    s"""<${EX}alice> <${EX}name> "Alice" .
       |<${EX}alice> <${EX}age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
       |<${EX}alice> <${EX}knows> <${EX}bob> .
       |<${EX}alice> <${EX}knows> <${EX}carol> .
       |<${EX}bob> <${EX}name> "Bob" .
       |<${EX}bob> <${EX}age> "25"^^<http://www.w3.org/2001/XMLSchema#integer> .
       |<${EX}bob> <${EX}knows> <${EX}dave> .
       |<${EX}carol> <${EX}name> "Carol" .
       |<${EX}carol> <${EX}age> "35"^^<http://www.w3.org/2001/XMLSchema#integer> .
       |<${EX}dave> <${EX}name> "Dave" .
       |<${EX}eve> <${EX}name> "Eve"@en .
       |<${EX}g1s> <${EX}p> "in-g1" <${EX}graph1> .
       |""".stripMargin))

  test("BGP join + projection") {
    val df = g.select(s"""SELECT ?n WHERE { ?a <${EX}knows> ?b . ?b <${EX}name> ?n }""")
    assert(lex(df, "n") == Seq("Bob", "Carol", "Dave"))
  }

  test("FILTER comparison on numbers") {
    val df = g.select(s"""SELECT ?n WHERE { ?x <${EX}age> ?a . ?x <${EX}name> ?n . FILTER(?a > 28) }""")
    assert(lex(df, "n") == Seq("Alice", "Carol"))
  }

  test("FILTER STRLEN + string fn") {
    val df = g.select(s"""SELECT ?n WHERE { ?x <${EX}name> ?n . FILTER(STRLEN(?n) = 5) }""")
    assert(lex(df, "n") == Seq("Alice", "Carol"))
  }

  test("OPTIONAL keeps unmatched rows") {
    val df = g.select(
      s"""SELECT ?n ?a WHERE { ?x <${EX}name> ?n . OPTIONAL { ?x <${EX}age> ?a } }""")
    val r = rows(df, "n", "a")
    assert(r.contains(Seq("Dave", "∅")) && r.contains(Seq("Alice", "30")) && r.size == 5)
  }

  test("OPTIONAL with filter inside is part of join condition") {
    val df = g.select(
      s"""SELECT ?n ?a WHERE { ?x <${EX}name> ?n . OPTIONAL { ?x <${EX}age> ?a FILTER(?a > 28) } }""")
    val r = rows(df, "n", "a")
    assert(r.contains(Seq("Bob", "∅")) && r.contains(Seq("Carol", "35")))
  }

  test("UNION pads missing vars") {
    val df = g.select(
      s"""SELECT ?n ?a WHERE { { ?x <${EX}name> ?n } UNION { ?x <${EX}age> ?a } }""")
    assert(df.count() == 8)
  }

  test("MINUS removes compatible") {
    val df = g.select(
      s"""SELECT ?x WHERE { ?x <${EX}name> ?n . MINUS { ?x <${EX}age> ?a } }""")
    assert(lex(df, "x") == Seq(s"${EX}dave", s"${EX}eve"))
  }

  test("VALUES join") {
    val df = g.select(
      s"""SELECT ?n WHERE { ?x <${EX}name> ?n . VALUES ?x { <${EX}alice> <${EX}bob> } }""")
    assert(lex(df, "n") == Seq("Alice", "Bob"))
  }

  test("BIND arithmetic with integer type") {
    val df = g.select(
      s"""SELECT ?y WHERE { <${EX}alice> <${EX}age> ?a . BIND(?a + 5 AS ?y) }""")
    assert(lex(df, "y") == Seq("35"))
    val dt = df.select("y.dt").collect()(0).getString(0)
    assert(dt == "http://www.w3.org/2001/XMLSchema#integer")
  }

  test("division yields decimal") {
    val df = g.select(s"""SELECT ?y WHERE { <${EX}alice> <${EX}age> ?a . BIND(?a / 4 AS ?y) }""")
    assert(lex(df, "y") == Seq("7.5"))
    assert(df.select("y.dt").collect()(0).getString(0).endsWith("decimal"))
  }

  test("aggregation: COUNT + GROUP BY") {
    val df = g.select(
      s"""SELECT ?a (COUNT(?b) AS ?c) WHERE { ?a <${EX}knows> ?b } GROUP BY ?a""")
    assert(rows(df, "a", "c") == Set(Seq(s"${EX}alice", "2"), Seq(s"${EX}bob", "1")))
  }

  test("aggregation: SUM/AVG/MIN/MAX over integers") {
    val df = g.select(
      s"""SELECT (SUM(?a) AS ?s) (AVG(?a) AS ?av) (MIN(?a) AS ?mn) (MAX(?a) AS ?mx)
         |WHERE { ?x <${EX}age> ?a }""".stripMargin)
    assert(rows(df, "s", "av", "mn", "mx") == Set(Seq("90", "30", "25", "35")))
  }

  test("GROUP_CONCAT with separator") {
    val df = g.select(
      s"""SELECT (GROUP_CONCAT(?n; SEPARATOR=",") AS ?ns)
         |WHERE { ?x <${EX}name> ?n . FILTER(STRSTARTS(?n, "A") || STRSTARTS(?n, "B")) }""".stripMargin)
    val v = lex(df, "ns").head.split(",").sorted.toSeq
    assert(v == Seq("Alice", "Bob"))
  }

  test("implicit group (aggregate without GROUP BY) over empty input") {
    val df = g.select(s"""SELECT (COUNT(?x) AS ?c) WHERE { ?x <${EX}nonexistent> ?y }""")
    assert(lex(df, "c") == Seq("0"))
  }

  test("ORDER BY + LIMIT/OFFSET") {
    val df = g.select(
      s"""SELECT ?n WHERE { ?x <${EX}name> ?n . ?x <${EX}age> ?a } ORDER BY DESC(?a) LIMIT 2 OFFSET 1""")
    assert(df.select("n.v").collect().map(_.getString(0)).toSeq == Seq("Alice", "Bob"))
  }

  test("DISTINCT") {
    val df = g.select(s"""SELECT DISTINCT ?p WHERE { ?s ?p ?o }""")
    assert(df.count() == 3) // name, age, knows (graph1 triple not in default graph)
  }

  test("property path: one-or-more (+)") {
    val df = g.select(s"""SELECT ?y WHERE { <${EX}alice> <${EX}knows>+ ?y }""")
    assert(lex(df, "y") == Seq(s"${EX}bob", s"${EX}carol", s"${EX}dave"))
  }

  test("property path: sequence") {
    val df = g.select(s"""SELECT ?n WHERE { <${EX}alice> <${EX}knows>/<${EX}name> ?n }""")
    assert(lex(df, "n") == Seq("Bob", "Carol"))
  }

  test("property path: alternative + reverse") {
    val df = g.select(s"""SELECT ?x WHERE { ?x (<${EX}knows>|^<${EX}knows>) <${EX}bob> }""")
    assert(lex(df, "x") == Seq(s"${EX}alice", s"${EX}dave"))
  }

  test("property path: zero-or-more") {
    val df = g.select(s"""SELECT ?y WHERE { <${EX}bob> <${EX}knows>* ?y }""")
    assert(lex(df, "y") == Seq(s"${EX}bob", s"${EX}dave"))
  }

  test("GRAPH with IRI") {
    val df = g.select(s"""SELECT ?o WHERE { GRAPH <${EX}graph1> { ?s <${EX}p> ?o } }""")
    assert(lex(df, "o") == Seq("in-g1"))
  }

  test("GRAPH with variable binds graph") {
    val df = g.select(s"""SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }""")
    assert(lex(df, "g") == Seq(s"${EX}graph1"))
  }

  test("FILTER EXISTS / NOT EXISTS") {
    val df = g.select(
      s"""SELECT ?n WHERE { ?x <${EX}name> ?n . FILTER EXISTS { ?x <${EX}knows> ?y } }""")
    assert(lex(df, "n") == Seq("Alice", "Bob"))
    val df2 = g.select(
      s"""SELECT ?n WHERE { ?x <${EX}name> ?n . FILTER NOT EXISTS { ?x <${EX}knows> ?y } }""")
    assert(lex(df2, "n") == Seq("Carol", "Dave", "Eve"))
  }

  test("language tags: LANG and LANGMATCHES") {
    val df = g.select(
      s"""SELECT ?n WHERE { ?x <${EX}name> ?n . FILTER(LANGMATCHES(LANG(?n), "en")) }""")
    assert(lex(df, "n") == Seq("Eve"))
  }

  test("IF / COALESCE / BOUND") {
    val df = g.select(
      s"""SELECT ?r WHERE { ?x <${EX}name> ?n . OPTIONAL { ?x <${EX}age> ?a }
         |BIND(IF(BOUND(?a), ?a, "none") AS ?r) FILTER(?n = "Dave") }""".stripMargin)
    assert(lex(df, "r") == Seq("none"))
  }

  test("subselect") {
    val df = g.select(
      s"""SELECT ?n WHERE {
         |  { SELECT ?x WHERE { ?x <${EX}knows> ?y } GROUP BY ?x }
         |  ?x <${EX}name> ?n }""".stripMargin)
    assert(lex(df, "n") == Seq("Alice", "Bob"))
  }

  test("ASK") {
    assert(g.askBoolean(s"""ASK { <${EX}alice> <${EX}knows> <${EX}bob> }"""))
    assert(!g.askBoolean(s"""ASK { <${EX}bob> <${EX}knows> <${EX}alice> }"""))
  }

  test("CONSTRUCT emits instantiated template") {
    val df = g.query(
      s"""CONSTRUCT { ?b <${EX}knownBy> ?a } WHERE { ?a <${EX}knows> ?b }""")
    assert(df.count() == 3)
    assert(rows(df, "subject", "object").contains(Seq(s"${EX}bob", s"${EX}alice")))
  }

  test("DESCRIBE returns outgoing triples") {
    val df = g.query(s"""DESCRIBE <${EX}alice>""")
    assert(df.count() == 4)
  }

  test("REGEX and REPLACE") {
    val df = g.select(
      s"""SELECT ?r WHERE { ?x <${EX}name> ?n . FILTER(REGEX(?n, "^a", "i"))
         |BIND(REPLACE(?n, "l", "L") AS ?r) }""".stripMargin)
    assert(lex(df, "r") == Seq("ALice"))
  }

  test("IN / NOT IN") {
    val df = g.select(
      s"""SELECT ?n WHERE { ?x <${EX}name> ?n . FILTER(?n IN ("Alice", "Bob")) }""")
    assert(lex(df, "n") == Seq("Alice", "Bob"))
  }

  test("xsd casts") {
    val df = g.select(
      s"""PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
         |SELECT ?d ?i WHERE { <${EX}alice> <${EX}age> ?a .
         |BIND(xsd:double(?a) AS ?d) BIND(xsd:integer("7") AS ?i) }""".stripMargin)
    assert(rows(df, "d", "i") == Set(Seq("30", "7")))
  }

  test("REDUCED permits deduplication") {
    val df = g.select(s"""SELECT REDUCED ?p WHERE { ?s ?p ?o }""")
    assert(df.count() == 3) // our REDUCED = full dedup (permitted by spec)
  }

  test("CONSTRUCT with bnode template scopes bnodes per solution") {
    val df = g.query(
      s"""CONSTRUCT { ?a <${EX}via> _:x . _:x <${EX}to> ?b } WHERE { ?a <${EX}knows> ?b }""")
    assert(df.count() == 6) // 3 solutions × 2 template triples
    // the 3 _:x bnodes must be distinct across solutions
    val bnodes = df.select("object.v").where("object.t = 1").collect().map(_.getString(0)).toSet
    assert(bnodes.size == 3)
  }

  test("CONSTRUCT bnodes stay co-referent across templates on a shuffled solution relation") {
    import graft.model._
    // join-shaped WHERE (shuffle) + two actions on the result: the pinned
    // row ids must keep each solution's _:x identical in both templates
    val quads = (0 until 150).flatMap { i =>
      Seq(RdfQuad(None, Iri(s"urn:a$i"), Iri("urn:p"), Iri(s"urn:m$i")),
          RdfQuad(None, Iri(s"urn:m$i"), Iri("urn:q"), Lit.simple(s"v$i")))
    }
    val eng = graft.engine.Graft(graft.sources.Turtle.quadsToDF(spark, quads))
    val df = eng.query(
      "CONSTRUCT { ?a <urn:via> _:x . _:x <urn:to> ?v } WHERE { ?a <urn:p> ?m . ?m <urn:q> ?v }")
    assert(df.count() == 300) // first action
    val via = df.filter(org.apache.spark.sql.functions.col("predicate.v") === "urn:via")
      .selectExpr("subject.v as a", "object.v as b")
    val to = df.filter(org.apache.spark.sql.functions.col("predicate.v") === "urn:to")
      .selectExpr("subject.v as b2", "object.v as v")
    val pairs = via.join(to, via("b") === to("b2")).select("a", "v")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet // second action
    assert(pairs == (0 until 150).map(i => (s"urn:a$i", s"v$i")).toSet)
  }

  test("FROM NAMED restricts GRAPH matching") {
    val q1 = g.select(
      s"""SELECT ?g FROM NAMED <${EX}graph1> WHERE { GRAPH ?g { ?s ?p ?o } }""")
    assert(lex(q1, "g") == Seq(s"${EX}graph1"))
    val q2 = g.select(
      s"""SELECT ?g FROM NAMED <${EX}other> WHERE { GRAPH ?g { ?s ?p ?o } }""")
    assert(q2.count() == 0)
    val q3 = g.select(
      s"""SELECT ?o FROM NAMED <${EX}other> WHERE { GRAPH <${EX}graph1> { ?s ?p ?o } }""")
    assert(q3.count() == 0) // graph1 not in the named list
  }

  test("queries over an empty store") {
    val empty = Graft(NTriples.fromString(spark, ""))
    assert(empty.select("SELECT ?s WHERE { ?s ?p ?o }").count() == 0)
    assert(!empty.askBoolean("ASK { ?s ?p ?o }"))
    assert(lex(empty.select("SELECT (COUNT(?s) AS ?c) WHERE { ?s ?p ?o }"), "c") == Seq("0"))
  }

  test("HAVING") {
    val df = g.select(
      s"""SELECT ?a (COUNT(?b) AS ?c) WHERE { ?a <${EX}knows> ?b } GROUP BY ?a HAVING(COUNT(?b) > 1)""")
    assert(rows(df, "a", "c") == Set(Seq(s"${EX}alice", "2")))
  }
}
