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
}
