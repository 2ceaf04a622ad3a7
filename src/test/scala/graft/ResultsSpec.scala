package graft

import java.nio.file.Files
import graft.engine.{Graft, Results}
import graft.sources.NTriples
import graft.testkit.TestSuite

/** Result serialisation round-trips (SRX via our own reader, JSON/CSV/TSV
  * shape checks). */
class ResultsSpec extends SparkSpec {

  private val EX = "http://ex.org/"

  lazy val df = Graft(NTriples.fromString(spark,
    s"""<${EX}a> <${EX}name> "Al \\"ice\\"" .
       |<${EX}a> <${EX}age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
       |<${EX}b> <${EX}name> "Bob"@en .
       |""".stripMargin))
    .select(s"""SELECT ?s ?n WHERE { ?s <${EX}name> ?n } ORDER BY ?n""")

  test("SRX round-trips through our own reader") {
    val xml = Results.toXml(df)
    val tmp = Files.createTempFile("res", ".srx")
    Files.writeString(tmp, xml)
    TestSuite.readSrx(tmp) match {
      case TestSuite.ExpectedSolutions(vars, rows, _) =>
        assert(vars.toSet == Set("s", "n"))
        assert(rows.size == 2)
        assert(rows.exists(_.get("n").exists {
          case graft.model.Lit(v, _, Some("en")) => v == "Bob"
          case _ => false
        }))
        assert(rows.exists(_.get("n").exists {
          case graft.model.Lit(v, _, None) => v == "Al \"ice\""
          case _ => false
        }))
      case other => fail(s"unexpected $other")
    }
  }

  test("JSON contains typed bindings") {
    val j = Results.toJson(df)
    assert(j.contains(""""type":"uri","value":"http://ex.org/a""""))
    assert(j.contains(""""xml:lang":"en""""))
    assert(j.startsWith("""{"head":{"vars":["""))
    assert(Results.booleanJson(true) == """{"head":{},"boolean":true}""")
  }

  test("CSV quotes and TSV full term syntax") {
    val csv = Results.csvString(df)
    assert(csv.startsWith("s,n\r\n"))
    assert(csv.contains("\"Al \"\"ice\"\"\""))
    val tsv = Results.tsvString(df)
    assert(tsv.startsWith("?s\t?n\n"))
    assert(tsv.contains("<http://ex.org/b>\t\"Bob\"@en"))
  }
}
