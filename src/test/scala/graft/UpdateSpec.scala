package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.Turtle

/**
 * SPARQL 1.1 Update over the immutable QuadStore — behaviors mirror the
 * W3C Update evaluation suite families (insert-data, delete-data,
 * delete-where, delete-insert, load, clear, drop, create, add, move, copy).
 * The reference stubs Update entirely (store.rs:409-414), so expectations
 * here come from the spec, cross-checked against oxigraph semantics for the
 * store-discretionary corners (empty-graph listing after CLEAR).
 */
class UpdateSpec extends SparkSpec {

  private def store(quads: RdfQuad*): QuadStore =
    QuadStore(Turtle.quadsToDF(spark, quads))

  private val g1 = Iri("urn:graph:1")
  private val g2 = Iri("urn:graph:2")
  private def q(s: String, p: String, o: RdfTerm, g: Option[Iri] = None) =
    RdfQuad(g, Iri(s), Iri(p), o)

  private def allQuads(st: QuadStore): Set[(String, String, String, String)] =
    st.quads.select(
      coalesce(col("graph.v"), lit("∅")),
      col("subject.v"), col("predicate.v"),
      concat(col("object.v"), coalesce(concat(lit("@"), col("object.lang")), lit("")))
    ).collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet

  test("INSERT DATA: default + named graph, re-insert is a set no-op") {
    val st0 = store(q("urn:a", "urn:p", Iri("urn:b")))
    val st1 = st0.update("""
      INSERT DATA {
        <urn:a> <urn:p> <urn:c> .
        GRAPH <urn:graph:1> { <urn:a> <urn:p> "x" }
        <urn:a> <urn:p> <urn:b> .
      }""")
    assert(st1.count() == 3) // re-inserted <urn:a p b> deduped
    assert(allQuads(st1) == Set(
      ("∅", "urn:a", "urn:p", "urn:b"),
      ("∅", "urn:a", "urn:p", "urn:c"),
      ("urn:graph:1", "urn:a", "urn:p", "x")))
    assert(st0.count() == 1) // snapshot isolation: old store untouched
  }

  test("INSERT DATA: bnodes are fresh per operation") {
    val st = QuadStore.empty(spark)
      .update("INSERT DATA { _:b <urn:p> <urn:o> }")
      .update("INSERT DATA { _:b <urn:p> <urn:o> }")
    assert(st.count() == 2) // same label, different ops → distinct bnodes
    val st2 = st.update("INSERT DATA { _:c <urn:p> <urn:o1> . _:c <urn:q> <urn:o2> }")
    val subs = st2.quads.filter(col("predicate.v").isin("urn:p", "urn:q"))
      .filter(col("object.v").isin("urn:o1", "urn:o2"))
      .select("subject.v").collect().map(_.getString(0)).toSet
    assert(subs.size == 1) // same label, same op → same bnode
  }

  test("INSERT DATA rejects variables; DELETE DATA rejects variables and bnodes") {
    val st = QuadStore.empty(spark)
    intercept[IllegalArgumentException](st.update("INSERT DATA { ?s <urn:p> <urn:o> }"))
    intercept[IllegalArgumentException](st.update("DELETE DATA { ?s <urn:p> <urn:o> }"))
    intercept[IllegalArgumentException](st.update("DELETE DATA { _:b <urn:p> <urn:o> }"))
    intercept[IllegalArgumentException](st.update("DELETE WHERE { _:b <urn:p> <urn:o> }"))
  }

  test("DELETE DATA: exact-quad removal, literal forms must match exactly") {
    val st0 = store(
      q("urn:a", "urn:p", Lit("1", Xsd.integer, None)),
      q("urn:a", "urn:p", Lit("01", Xsd.integer, None)),
      q("urn:a", "urn:p", Lit("hello", Xsd.string, None), Some(g1)))
    val st1 = st0.update("DELETE DATA { <urn:a> <urn:p> 1 }")
    assert(st1.count() == 2) // "01"^^integer is a DIFFERENT quad (same value)
    val st2 = st1.update("""DELETE DATA { GRAPH <urn:graph:1> { <urn:a> <urn:p> "hello" } }""")
    assert(st2.count() == 1)
    // deleting a non-existent quad is a no-op
    assert(st2.update("DELETE DATA { <urn:zz> <urn:p> <urn:o> }").count() == 1)
  }

  test("DELETE WHERE: pattern doubles as template, GRAPH blocks join") {
    val st0 = store(
      q("urn:a", "urn:type", Iri("urn:Old")),
      q("urn:a", "urn:name", Lit.simple("a")),
      q("urn:b", "urn:type", Iri("urn:New")),
      q("urn:b", "urn:name", Lit.simple("b")),
      q("urn:a", "urn:note", Lit.simple("na"), Some(g1)))
    val st1 = st0.update("DELETE WHERE { ?s <urn:type> <urn:Old> . ?s <urn:name> ?n }")
    assert(allQuads(st1) == Set(
      ("∅", "urn:b", "urn:type", "urn:New"),
      ("∅", "urn:b", "urn:name", "b"),
      ("urn:graph:1", "urn:a", "urn:note", "na")))
    // GRAPH block: deletes the named-graph quad joined with default-graph data
    val st2 = st0.update(
      "DELETE WHERE { ?s <urn:type> <urn:Old> . GRAPH <urn:graph:1> { ?s <urn:note> ?x } }")
    assert(!allQuads(st2).exists(_._1 == "urn:graph:1"))
    assert(!allQuads(st2).contains(("∅", "urn:a", "urn:type", "urn:Old")))
    assert(allQuads(st2).contains(("∅", "urn:a", "urn:name", "a"))) // not in template
  }

  test("DELETE/INSERT WHERE: rename predicate, both sides see pre-state") {
    val st0 = store(
      q("urn:a", "urn:old", Lit.simple("1")),
      q("urn:b", "urn:old", Lit.simple("2")),
      q("urn:c", "urn:other", Lit.simple("3")))
    val st1 = st0.update(
      "DELETE { ?s <urn:old> ?o } INSERT { ?s <urn:new> ?o } WHERE { ?s <urn:old> ?o }")
    assert(allQuads(st1) == Set(
      ("∅", "urn:a", "urn:new", "1"),
      ("∅", "urn:b", "urn:new", "2"),
      ("∅", "urn:c", "urn:other", "3")))
  }

  test("Modify: unbound template vars skip the instantiation; literal subjects dropped") {
    val st0 = store(
      q("urn:a", "urn:p", Lit.simple("x")),
      q("urn:b", "urn:p", Lit.simple("y")))
    // OPTIONAL leaves ?n unbound for urn:b → only urn:a's insert instantiates;
    // the ?o-as-subject template instantiation is a literal subject → skipped
    val st1 = st0.update("""
      INSERT { ?s <urn:tagged> ?n . ?o <urn:rev> ?s }
      WHERE { ?s <urn:p> ?o .
              OPTIONAL { ?s2 <urn:p> ?n . FILTER(?s2 = <urn:a> && ?s = <urn:a>) } }""")
    val added = allQuads(st1) -- allQuads(st0)
    assert(added == Set(("∅", "urn:a", "urn:tagged", "x")))
  }

  test("Modify: INSERT-template bnodes are fresh per solution") {
    val st0 = store(
      q("urn:a", "urn:p", Lit.simple("1")),
      q("urn:b", "urn:p", Lit.simple("2")))
    val st1 = st0.update(
      "INSERT { ?s <urn:ref> _:n . _:n <urn:val> ?o } WHERE { ?s <urn:p> ?o }")
    val bn = st1.quads.filter(col("predicate.v") === "urn:ref")
      .select("object.v").collect().map(_.getString(0)).toSet
    assert(bn.size == 2) // one fresh bnode per solution
    // and the two quads of one solution share the SAME bnode
    val pairs = st1.quads.filter(col("predicate.v") === "urn:val")
      .select("subject.v").collect().map(_.getString(0)).toSet
    assert(pairs == bn)
  }

  test("Modify: template bnodes stay co-referent across templates on a shuffled solution relation") {
    // the solution relation includes a JOIN (a shuffle whose output
    // partitioning is not deterministic across re-evaluations); without the
    // pinned row ids the two template instantiations could deal DIFFERENT
    // ids to the same solution and the shared bnode would not be co-referent
    val base = (0 until 200).flatMap { i =>
      Seq(q(s"urn:s$i", "urn:p", Iri(s"urn:o$i")),
          RdfQuad(None, Iri(s"urn:o$i"), Iri("urn:q"), Lit.simple(s"v$i")))
    }
    val st0 = store(base: _*)
    val st1 = st0.update(
      "INSERT { ?s <urn:ref> _:n . _:n <urn:val> ?v } WHERE { ?s <urn:p> ?o . ?o <urn:q> ?v }")
    // force TWO separate actions over the updated store (re-evaluation risk)
    assert(st1.quads.filter(col("predicate.v") === "urn:ref").count() == 200)
    val refs = st1.quads.filter(col("predicate.v") === "urn:ref")
      .select(col("subject.v").as("s"), col("object.v").as("b"))
    val vals = st1.quads.filter(col("predicate.v") === "urn:val")
      .select(col("subject.v").as("b2"), col("object.v").as("v"))
    val joined = refs.join(vals, col("b") === col("b2"))
      .select("s", "v").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(joined == (0 until 200).map(i => (s"urn:s$i", s"v$i")).toSet,
      "each solution's template bnode must link its own ?s to its own ?v")
    assert(vals.select("b2").distinct().count() == 200) // fresh bnode per solution
  }

  test("WITH: default graph for WHERE and both templates") {
    val st0 = store(
      q("urn:a", "urn:p", Lit.simple("g1"), Some(g1)),
      q("urn:a", "urn:p", Lit.simple("dft")))
    val st1 = st0.update(
      "WITH <urn:graph:1> DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:q> ?o } WHERE { ?s <urn:p> ?o }")
    assert(allQuads(st1) == Set(
      ("urn:graph:1", "urn:a", "urn:q", "g1"),
      ("∅", "urn:a", "urn:p", "dft"))) // default graph untouched
  }

  test("USING: dataset for WHERE like FROM; GRAPH template routes inserts") {
    val st0 = store(
      q("urn:a", "urn:p", Lit.simple("1"), Some(g1)),
      q("urn:b", "urn:p", Lit.simple("2"), Some(g2)))
    val st1 = st0.update("""
      INSERT { GRAPH <urn:graph:2> { ?s <urn:copied> ?o } }
      USING <urn:graph:1> WHERE { ?s <urn:p> ?o }""")
    val added = allQuads(st1) -- allQuads(st0)
    assert(added == Set(("urn:graph:2", "urn:a", "urn:copied", "1")))
  }

  test("request sequencing: ops see the previous op's state; prologue accumulates") {
    val st = QuadStore.empty(spark).update("""
      PREFIX ex: <urn:ex:>
      INSERT DATA { ex:a ex:p 1 } ;
      PREFIX ex2: <urn:ex2:>
      INSERT { ex2:b ex:q ?o } WHERE { ex:a ex:p ?o } ;
      DELETE DATA { ex:a ex:p 1 }""")
    assert(allQuads(st) == Set(("∅", "urn:ex2:b", "urn:ex:q", "1")))
  }

  test("CLEAR/DROP GRAPH, DEFAULT, NAMED, ALL + existence errors + SILENT") {
    val st0 = store(
      q("urn:a", "urn:p", Lit.simple("d")),
      q("urn:a", "urn:p", Lit.simple("1"), Some(g1)),
      q("urn:a", "urn:p", Lit.simple("2"), Some(g2)))
    val c1 = st0.update("CLEAR GRAPH <urn:graph:1>")
    assert(c1.count() == 2)
    assert(c1.containsNamedGraph(g1)) // cleared graph stays listed
    val d1 = st0.update("DROP GRAPH <urn:graph:1>")
    assert(d1.count() == 2 && !d1.containsNamedGraph(g1))
    intercept[IllegalArgumentException](st0.update("CLEAR GRAPH <urn:nope>"))
    intercept[IllegalArgumentException](st0.update("DROP GRAPH <urn:nope>"))
    assert(st0.update("CLEAR SILENT GRAPH <urn:nope>").count() == 3)
    assert(st0.update("DROP SILENT GRAPH <urn:nope>").count() == 3)
    assert(st0.update("CLEAR DEFAULT").count() == 2)
    val cn = st0.update("CLEAR NAMED")
    assert(cn.count() == 1 && cn.containsNamedGraph(g1) && cn.containsNamedGraph(g2))
    val dn = st0.update("DROP NAMED")
    assert(dn.count() == 1 && !dn.containsNamedGraph(g1))
    val ca = st0.update("CLEAR ALL")
    assert(ca.count() == 0 && ca.containsNamedGraph(g2))
    assert(st0.update("DROP ALL").namedGraphs().count() == 0)
  }

  test("CREATE errors on existing graph unless SILENT") {
    val st0 = store(q("urn:a", "urn:p", Lit.simple("1"), Some(g1)))
    val st1 = st0.update("CREATE GRAPH <urn:graph:9>")
    assert(st1.containsNamedGraph(Iri("urn:graph:9")))
    intercept[IllegalArgumentException](st0.update("CREATE GRAPH <urn:graph:1>"))
    assert(st0.update("CREATE SILENT GRAPH <urn:graph:1>").count() == 1)
  }

  test("ADD / COPY / MOVE between graphs and DEFAULT") {
    val st0 = store(
      q("urn:a", "urn:p", Lit.simple("d")),
      q("urn:x", "urn:p", Lit.simple("1"), Some(g1)),
      q("urn:y", "urn:p", Lit.simple("2"), Some(g2)))
    // ADD: src stays, dest keeps its own
    val add = st0.update("ADD <urn:graph:1> TO <urn:graph:2>")
    assert(allQuads(add) == allQuads(st0) + (("urn:graph:2", "urn:x", "urn:p", "1")))
    // COPY: dest replaced
    val cp = st0.update("COPY <urn:graph:1> TO <urn:graph:2>")
    assert(allQuads(cp) == Set(
      ("∅", "urn:a", "urn:p", "d"),
      ("urn:graph:1", "urn:x", "urn:p", "1"),
      ("urn:graph:2", "urn:x", "urn:p", "1")))
    // MOVE: src gone
    val mv = st0.update("MOVE <urn:graph:1> TO <urn:graph:2>")
    assert(allQuads(mv) == Set(
      ("∅", "urn:a", "urn:p", "d"),
      ("urn:graph:2", "urn:x", "urn:p", "1")))
    assert(!mv.containsNamedGraph(g1))
    // DEFAULT as destination and source
    val toDft = st0.update("COPY <urn:graph:1> TO DEFAULT")
    assert(allQuads(toDft) == Set(
      ("∅", "urn:x", "urn:p", "1"),
      ("urn:graph:1", "urn:x", "urn:p", "1"),
      ("urn:graph:2", "urn:y", "urn:p", "2")))
    val fromDft = st0.update("ADD DEFAULT TO <urn:graph:1>")
    assert(allQuads(fromDft) == allQuads(st0) + (("urn:graph:1", "urn:a", "urn:p", "d")))
    // self is a no-op; missing named source errors unless SILENT
    assert(allQuads(st0.update("MOVE <urn:graph:1> TO <urn:graph:1>")) == allQuads(st0))
    intercept[IllegalArgumentException](st0.update("ADD <urn:nope> TO <urn:graph:1>"))
    assert(allQuads(st0.update("ADD SILENT <urn:nope> TO <urn:graph:1>")) == allQuads(st0))
  }

  test("ADD/COPY/MOVE SILENT with a missing source leave the store UNCHANGED") {
    // W3C update-silent semantics (add07/copy07/move07): SILENT suppresses
    // the error AND the failed operation has no effect — the destination is
    // neither cleared nor registered.
    val st0 = store(
      q("urn:keep", "urn:p", Lit.simple("v"), Some(g2)),
      q("urn:d", "urn:p", Lit.simple("dft")))
    val cp = st0.update("COPY SILENT GRAPH <urn:nope> TO GRAPH <urn:graph:2>")
    assert(allQuads(cp) == allQuads(st0), "COPY SILENT must not wipe the destination")
    val mv = st0.update("MOVE SILENT GRAPH <urn:nope> TO GRAPH <urn:graph:2>")
    assert(allQuads(mv) == allQuads(st0), "MOVE SILENT must not wipe the destination")
    val ad = st0.update("ADD SILENT GRAPH <urn:nope> TO GRAPH <urn:graph:7>")
    assert(allQuads(ad) == allQuads(st0))
    assert(!ad.containsNamedGraph(Iri("urn:graph:7")),
      "ADD SILENT with a missing source must not register the destination")
    // non-silent forms still error
    intercept[IllegalArgumentException](st0.update("COPY GRAPH <urn:nope> TO GRAPH <urn:graph:2>"))
    intercept[IllegalArgumentException](st0.update("MOVE GRAPH <urn:nope> TO GRAPH <urn:graph:2>"))
  }

  test("protocol dataset params reject WITH as well as USING (protocol §2.2.3)") {
    val st0 = store(q("urn:a", "urn:p", Lit.simple("1"), Some(g1)))
    intercept[IllegalArgumentException](st0.update(
      "WITH <urn:graph:1> DELETE { ?s ?p ?o } WHERE { ?s ?p ?o }",
      Seq(g1), Nil))
    intercept[IllegalArgumentException](st0.update(
      "DELETE { ?s ?p ?o } USING <urn:graph:1> WHERE { ?s ?p ?o }",
      Seq(g1), Nil))
    // a plain Modify with neither WITH nor USING accepts the protocol dataset
    val ok = st0.update("DELETE { ?s ?p ?o } WHERE { ?s ?p ?o }", Seq(g1), Nil)
    assert(allQuads(ok) == allQuads(st0)) // WHERE scoped to g1-as-default; templates target the real default graph
  }

  test("LOAD over http(s): content-type dispatch, INTO GRAPH, SILENT on transport/parse failure") {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, ctype: String, body: String): Unit =
      srv.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", ctype)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      })
    serve("/data.ttl", "text/turtle",
      "@prefix ex: <urn:ex:> . ex:s ex:p \"turtle\" , ex:o .")
    serve("/data", "application/n-triples",
      "<urn:ex:s> <urn:ex:p> \"nt\" .")
    serve("/bad.ttl", "text/turtle", "@prefix broken @@@")
    srv.createContext("/missing", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    srv.start()
    val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
    try {
      val st0 = QuadStore.empty(spark)
      assert(st0.update(s"LOAD <$base/data.ttl>").count() == 2)
      // content-type (not extension) picks the N-Triples reader here
      val st2 = st0.update(s"LOAD <$base/data> INTO GRAPH <urn:graph:1>")
      assert(st2.quadsForPattern(graph = Some(Some(g1))).count() == 1)
      intercept[Throwable](st0.update(s"LOAD <$base/missing>"))
      assert(st0.update(s"LOAD SILENT <$base/missing>").count() == 0)
      intercept[Throwable](st0.update(s"LOAD <$base/bad.ttl>"))
      assert(st0.update(s"LOAD SILENT <$base/bad.ttl>").count() == 0)
    } finally srv.stop(0)
  }

  test("LOAD SILENT swallows a lazily-failing .nt parse (executor-side failure)") {
    // a file whose malformedness only surfaces when executors parse the
    // lines: without eager materialisation under SILENT, the failure would
    // escape the handler and crash a later action on the store
    val dir = java.nio.file.Files.createTempDirectory("graft-lazyload").toFile
    val f = new java.io.File(dir, "bad.nt")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("<urn:ok> <urn:p> \"fine\" .")
    w.println("this is not an n-triples line at all @@@")
    w.close()
    val st = QuadStore.empty(spark).update(s"LOAD SILENT <file://${f.getAbsolutePath}>")
    assert(st.count() == 0) // the whole failed LOAD is ignored, store unchanged
  }

  test("LOAD: file into default and INTO GRAPH; SILENT on missing file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-load").toFile
    val f = new java.io.File(dir, "data.nt")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("<urn:l:s> <urn:l:p> \"loaded\" .")
    w.println("<urn:l:s> <urn:l:p> <urn:l:o> .")
    w.close()
    val st0 = QuadStore.empty(spark)
    val st1 = st0.update(s"LOAD <file://${f.getAbsolutePath}>")
    assert(st1.count() == 2)
    val st2 = st0.update(s"LOAD <${f.getAbsolutePath}> INTO GRAPH <urn:graph:1>")
    assert(st2.quadsForPattern(graph = Some(Some(g1))).count() == 2)
    intercept[Throwable](st0.update("LOAD <file:///nonexistent/xyz.nt>"))
    assert(st0.update("LOAD SILENT <file:///nonexistent/xyz.nt>").count() == 0)
  }

  test("update round-trips through save/load persistence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upd").toFile.getAbsolutePath
    val st0 = store(q("urn:a", "urn:p", Lit.simple("1")))
    st0.update("INSERT DATA { <urn:b> <urn:p> 2 }").save(s"$dir/st")
    val re = QuadStore.load(spark, s"$dir/st")
    assert(re.count() == 2)
    assert(re.update("DELETE WHERE { ?s <urn:p> ?o }").count() == 0)
  }

  test("INSERT DATA plan shape: the store is scanned, never shuffled") {
    import spark.implicits._
    // a store big enough that AQE keeps the additions as the broadcast side
    val big = QuadStore(graft.sources.Turtle.quadsToDF(spark,
      (0 until 5000).map(i => q(s"urn:s$i", s"urn:p${i % 7}", Lit.integer(i)))))
    val updated = big.update("INSERT DATA { <urn:new> <urn:p> 1 . <urn:s1> <urn:p1> 1 }")
    assert(updated.count() == 5001) // one quad existed already
    val plan = updated.quads.queryExecution.executedPlan.toString
    // set-semantics check = semi join with the ADDITIONS broadcast; a
    // SortMergeJoin here would mean the whole store shuffled per insert
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast semi-join against the additions, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the store side must not shuffle for an INSERT DATA")
  }

  test("GRAPH ?var template routes deletes by bound graph") {
    val st0 = store(
      q("urn:a", "urn:p", Lit.simple("1"), Some(g1)),
      q("urn:a", "urn:p", Lit.simple("1"), Some(g2)),
      q("urn:keep", "urn:p", Lit.simple("2"), Some(g2)))
    // delete <urn:a>'s quads from whatever graph they are in
    val st1 = st0.update(
      "DELETE { GRAPH ?g { <urn:a> <urn:p> ?o } } WHERE { GRAPH ?g { <urn:a> <urn:p> ?o } }")
    assert(allQuads(st1) == Set(("urn:graph:2", "urn:keep", "urn:p", "2")))
  }
}
