package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.sparql.SparqlParser

/** Parses every benchmark query the reference ships (BSBM Explore, BSBM
  * Business Intelligence, Wind Farm — read-only at
  * /root/reference/bench/tests/query_results/queries/): the grammar must
  * cover real-world benchmark SPARQL, not just the regression corpus. */
class BenchQueryParseSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/bench/tests/query_results/queries")

  private val files =
    if (Files.isDirectory(dir))
      Files.list(dir).iterator().asScala.filter(_.toString.endsWith(".sparql")).toSeq.sortBy(_.toString)
    else Nil

  files.foreach { f =>
    test(s"parses ${f.getFileName}") {
      val text = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
      val q = SparqlParser.parse(text)
      assert(q != null)
    }
  }

  test("found the benchmark query corpus") {
    assert(files.size >= 25, s"only ${files.size} queries found")
  }
}
