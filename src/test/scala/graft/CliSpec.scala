package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

/** CLI convert: format conversion with graph scoping (the reference
  * `rdf-fusion convert` surface). */
class CliSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("convert turtle to n-quads") {
    spark // force shared session so Cli's getOrCreate reuses it
    val in = Files.createTempFile("cli_in", ".ttl")
    Files.write(in, """@prefix ex: <http://ex.org/> .
                      |ex:a ex:p "v" ; ex:q ex:b .
                      |""".stripMargin.getBytes(UTF_8))
    val out = tmpDir("cli_out") + "/out.nq"
    Cli.convert(Map("from-file" -> Seq(in.toString), "to-file" -> Seq(out)))
    val back = sources.NTriples.read(spark, out, quads = true)
    assert(back.count() == 2)
  }

  test("convert with --to-graph maps the default graph") {
    val in = Files.createTempFile("cli_in2", ".nt")
    Files.write(in, "<urn:s> <urn:p> \"x\" .\n".getBytes(UTF_8))
    val out = tmpDir("cli_out2") + "/out.nq"
    Cli.convert(Map("from-file" -> Seq(in.toString), "to-file" -> Seq(out),
      "to-graph" -> Seq("urn:g")))
    val back = QuadStore(sources.NTriples.read(spark, out, quads = true))
    assert(back.quadsForPattern(graph = Some(Some(model.Iri("urn:g")))).count() == 1)
  }

  test("convert with --from-graph extracts one graph as triples") {
    val in = Files.createTempFile("cli_in3", ".nq")
    Files.write(in, ("<urn:a> <urn:p> \"1\" <urn:g1> .\n" +
      "<urn:b> <urn:p> \"2\" <urn:g2> .\n" +
      "<urn:c> <urn:p> \"3\" .\n").getBytes(UTF_8))
    val out = tmpDir("cli_out3") + "/out.nt"
    Cli.convert(Map("from-file" -> Seq(in.toString), "to-file" -> Seq(out),
      "from-graph" -> Seq("urn:g1")))
    val back = sources.NTriples.read(spark, out)
    assert(back.count() == 1)
    assert(QuadStore(back).contains(model.RdfQuad(None, model.Iri("urn:a"),
      model.Iri("urn:p"), model.Lit.simple("1"))))
  }

  test("lenient conversion drops malformed lines") {
    val in = Files.createTempFile("cli_in4", ".nt")
    Files.write(in, ("<urn:s> <urn:p> \"ok\" .\nBROKEN LINE\n").getBytes(UTF_8))
    val out = tmpDir("cli_out4") + "/out.nq"
    Cli.convert(Map("from-file" -> Seq(in.toString), "to-file" -> Seq(out),
      "lenient" -> Nil))
    assert(sources.NTriples.read(spark, out, quads = true).count() == 1)
  }

  test("update applies a SPARQL update request and dumps the result") {
    val in = Files.createTempFile("cli_in5", ".nt")
    Files.write(in, ("<urn:a> <urn:old> \"1\" .\n" +
      "<urn:b> <urn:keep> \"2\" .\n").getBytes(UTF_8))
    val out = tmpDir("cli_out5") + "/post"
    Cli.update(Map("load" -> Seq(in.toString),
      "update" -> Seq(
        "DELETE { ?s <urn:old> ?o } INSERT { ?s <urn:new> ?o } WHERE { ?s <urn:old> ?o } ; " +
        "INSERT DATA { <urn:c> <urn:added> 3 }"),
      "out" -> Seq(out)))
    val back = QuadStore(sources.NTriples.read(spark, out, quads = true))
    assert(back.count() == 3)
    assert(back.ask("ASK { <urn:a> <urn:new> \"1\" }"))
    assert(!back.ask("ASK { ?s <urn:old> ?o }"))
    assert(back.ask("ASK { <urn:c> <urn:added> 3 }"))
  }
}
