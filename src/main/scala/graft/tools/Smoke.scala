package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.{NTriples, RdbToRdf}
import graft.sparql.SparqlParser

/** Manual smoke driver: exercises the public API end-to-end on tiny data.
  * Run: sbt "runMain graft.tools.Smoke [/path/to/file.nq]" */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== 1. SPARQL parse ===")
    val q = SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?name (COUNT(?q) AS ?n) WHERE {
        |  ?p ex:knows+ ?q . ?q ex:name ?name .
        |  OPTIONAL { ?q ex:age ?age }
        |  FILTER(STRLEN(?name) > 2 && ?age >= 18)
        |} GROUP BY ?name ORDER BY DESC(?n) LIMIT 10""".stripMargin)
    println(q)

    println("=== 2. N-Quads read ===")
    val path = args.headOption.getOrElse {
      // self-contained: (re)write the tiny fixture so the smoke run never
      // depends on leftovers from a previous session
      val p = "/tmp/smoke.nq"
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        ("""<http://ex.org/a> <http://ex.org/knows> <http://ex.org/b> .
           |<http://ex.org/b> <http://ex.org/name> "Bobé" .
           |<http://ex.org/b> <http://ex.org/age> "21"^^<http://www.w3.org/2001/XMLSchema#integer> <http://ex.org/g1> .
           |""".stripMargin).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      p
    }
    val quads = NTriples.read(spark, path, quads = true)
    quads.show(20, truncate = false)
    println(s"quad count = ${quads.count()}")

    println("=== 3. N-Quads round-trip (write lines) ===")
    NTriples.toNQuadLines(quads).show(20, truncate = false)

    println("=== 3b. unicode + strict-parse probes ===")
    // é must survive the reader (console may render it as '?')
    val bobe = quads.selectExpr("object.v").where("subject.v = 'http://ex.org/b'").collect()(0).getString(0)
    println(s"bobe codepoints = ${bobe.codePoints().toArray.mkString(",")} (expect ...,233)")
    try { NTriples.parseLine("<http://ex.org/a> <http://ex.org/b> .") ; println("BAD: no error") }
    catch { case e: Exception => println(s"malformed line -> ${e.getClass.getSimpleName}: ${e.getMessage.take(60)}") }

    println("=== 4. TPC-H region -> quads ===")
    val rq = RdbToRdf.tpchQuads(spark, "/root/testdata/sf0.001", tables = Seq("region", "nation"))
    rq.show(10, truncate = false)
    println(s"region+nation quad count = ${rq.count()}")

    println("=== 5. SPARQL end-to-end over TPC-H quads ===")
    val eng = graft.engine.Graft(rq)
    val res = eng.select(
      """PREFIX g: <urn:g:>
        |SELECT ?rname (COUNT(?n) AS ?nations) WHERE {
        |  ?n <urn:g:nation#ref_region> ?r .
        |  ?r <urn:g:region#r_name> ?rname .
        |} GROUP BY ?rname ORDER BY ?rname""".stripMargin)
    graft.engine.Graft.decode(res).show(10, truncate = false)

    spark.stop()
  }
}
