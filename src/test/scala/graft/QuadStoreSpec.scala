package graft

import graft.model._
import graft.sources.NTriples

/** Store facade: load, pattern scan, mutation, persistence round-trip. */
class QuadStoreSpec extends SparkSpec {

  private val EX = "http://ex.org/"

  private def store = QuadStore(NTriples.fromString(spark,
    s"""<${EX}a> <${EX}p> <${EX}b> .
       |<${EX}a> <${EX}q> "x" .
       |<${EX}b> <${EX}p> <${EX}c> <${EX}g1> .
       |""".stripMargin))

  test("quadsForPattern filters by components") {
    assert(store.quadsForPattern(predicate = Some(Iri(EX + "p"))).count() == 2)
    assert(store.quadsForPattern(graph = Some(None)).count() == 2)
    assert(store.quadsForPattern(graph = Some(Some(Iri(EX + "g1")))).count() == 1)
    assert(store.quadsForPattern(subject = Some(Iri(EX + "a")),
      obj = Some(Lit.simple("x"))).count() == 1)
  }

  test("insert and remove") {
    val s2 = store.insert(Seq(RdfQuad(None, Iri(EX + "d"), Iri(EX + "p"), Iri(EX + "e"))))
    assert(s2.count() == 4)
    val s3 = s2.remove(predicate = Some(Iri(EX + "p")), graph = Some(None))
    assert(s3.count() == 2) // named-graph p-quad survives (graph filter)
    assert(s3.quadsForPattern(predicate = Some(Iri(EX + "q"))).count() == 1)
  }

  test("namedGraphs and clear") {
    assert(lex(store.namedGraphs(), "graph") == Seq(EX + "g1"))
    assert(store.clear().isEmpty)
  }

  test("parquet save/load round-trip preserves quads") {
    val dir = java.nio.file.Files.createTempDirectory("qs").toString + "/quads"
    store.save(dir)
    val loaded = QuadStore.load(spark, dir)
    assert(loaded.count() == 3)
    assert(loaded.ask(s"""ASK { <${EX}a> <${EX}q> "x" }"""))
    assert(loaded.select(s"""SELECT ?o WHERE { <${EX}a> <${EX}p> ?o }""").count() == 1)
  }

  test("SPARQL over the store facade") {
    val df = store.select(s"""SELECT ?s WHERE { ?s <${EX}p> ?o }""")
    assert(lex(df, "s") == Seq(EX + "a")) // default graph only
  }

  // ---- round-3 Store-API parity (store.rs doc examples re-expressed) ----

  test("contains checks an exact quad incl. graph position") {
    assert(store.contains(RdfQuad(None, Iri(EX + "a"), Iri(EX + "p"), Iri(EX + "b"))))
    assert(store.contains(RdfQuad(Some(Iri(EX + "g1")), Iri(EX + "b"), Iri(EX + "p"), Iri(EX + "c"))))
    assert(!store.contains(RdfQuad(None, Iri(EX + "b"), Iri(EX + "p"), Iri(EX + "c"))))
    assert(!store.contains(RdfQuad(None, Iri(EX + "a"), Iri(EX + "p"), Lit.simple("x"))))
  }

  test("insertNamedGraph registers an empty graph (store.rs:710-738)") {
    val g = Iri(EX + "empty")
    assert(!store.containsNamedGraph(g))
    val s2 = store.insertNamedGraph(g)
    assert(s2.containsNamedGraph(g))
    assert(lex(s2.namedGraphs(), "graph").toSet == Set(EX + "g1", EX + "empty"))
    // idempotent
    assert(lex(s2.insertNamedGraph(g).namedGraphs(), "graph").size == 2)
  }

  test("clearGraph empties but keeps the graph listed (store.rs:740-766)") {
    val g = Iri(EX + "g1")
    val s2 = store.clearGraph(Some(g))
    assert(s2.quadsForPattern(graph = Some(Some(g))).isEmpty)
    assert(s2.containsNamedGraph(g))
    assert(lex(s2.namedGraphs(), "graph") == Seq(EX + "g1"))
    // default graph: cleared quads gone, named graph untouched
    val s3 = store.clearGraph(None)
    assert(s3.quadsForPattern(graph = Some(None)).isEmpty)
    assert(s3.count() == 1)
  }

  test("removeNamedGraph drops graph and quads (store.rs:769-796)") {
    val g = Iri(EX + "g1")
    val s2 = store.removeNamedGraph(g)
    assert(s2.count() == 2 && !s2.containsNamedGraph(g))
    assert(s2.namedGraphs().isEmpty)
    // removal after registration unregisters too
    assert(!store.insertNamedGraph(Iri(EX + "t")).removeNamedGraph(Iri(EX + "t"))
      .containsNamedGraph(Iri(EX + "t")))
  }

  test("graph survives removal of its last quad (remove registers it)") {
    val g = Iri(EX + "g1")
    val s2 = store.remove(graph = Some(Some(g)))
    assert(s2.quadsForPattern(graph = Some(Some(g))).isEmpty)
    assert(s2.containsNamedGraph(g))
    // regression: graph-targeted remove must NOT drop default-graph quads
    // (termEq over a NULL graph struct is NULL; filter(!NULL) ate them)
    assert(s2.count() == 2)
  }

  test("dumpGraph writes one graph as N-Triples") {
    val dir = java.nio.file.Files.createTempDirectory("qs_dumpg").toString + "/g1"
    store.dumpGraph(dir, Some(Iri(EX + "g1")))
    val back = NTriples.read(spark, dir)
    assert(back.count() == 1)
    assert(QuadStore(back).contains(RdfQuad(None, Iri(EX + "b"), Iri(EX + "p"), Iri(EX + "c"))))
  }

  test("explain returns Catalyst plans for a query") {
    val txt = store.explain(s"SELECT ?o WHERE { <${EX}a> <${EX}p> ?o }")
    assert(txt.contains("Physical Plan"))
    assert(store.explain(s"ASK { ?s ?p ?o }", mode = "simple").nonEmpty)
  }

  test("saveByPredicate round-trips and prunes partitions on bound predicates") {
    val dir = java.nio.file.Files.createTempDirectory("qs_bypred").toString + "/q"
    store.saveByPredicate(dir)
    val back = QuadStore.load(spark, dir)
    assert(back.count() == 3)
    // full round-trip fidelity
    assert(back.contains(RdfQuad(Some(Iri(EX + "g1")), Iri(EX + "b"), Iri(EX + "p"), Iri(EX + "c"))))
    assert(back.contains(RdfQuad(None, Iri(EX + "a"), Iri(EX + "q"), Lit.simple("x"))))
    // a bound-predicate pattern scan compiles to a partition-pruned read
    val scan = back.quadsForPattern(predicate = Some(Iri(EX + "q")))
    assert(scan.count() == 1)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__pv"),
      s"no partition pruning in:\n${plan.take(800)}")
    // SPARQL over the partitioned store (default graph only: a->b)
    assert(lex(back.select(s"SELECT ?o WHERE { ?s <${EX}p> ?o }"), "o") == Seq(EX + "b"))
  }

  test("empty store round-trips through both persistence layouts") {
    val base = java.nio.file.Files.createTempDirectory("qs_empty").toString
    val empty = store.clear()
    empty.save(base + "/flat")
    assert(QuadStore.load(spark, base + "/flat").isEmpty)
    empty.saveByPredicate(base + "/bypred")
    assert(QuadStore.load(spark, base + "/bypred").isEmpty)
  }
}
