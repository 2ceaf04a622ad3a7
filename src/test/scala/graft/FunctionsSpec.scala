package graft

import graft.engine.Graft
import graft.sources.NTriples

/** SPARQL builtin function semantics — edge cases from the reference's
  * per-function files (/root/reference/lib/functions/src/scalar/). */
class FunctionsSpec extends SparkSpec {

  private val EX = "http://ex.org/"
  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  lazy val g: Graft = Graft(NTriples.fromString(spark,
    s"""<${EX}x> <${EX}p> "anchor" .
       |<${EX}d> <${EX}when> "2011-01-10T14:45:13.815-05:00"^^<${XSD}dateTime> .
       |<${EX}n> <${EX}v> "-3.75"^^<${XSD}decimal> .
       |<${EX}m> <${EX}v> "abc"^^<${XSD}integer> .
       |""".stripMargin))

  private def one(expr: String, where: String = s"?s <${EX}p> ?o"): String = {
    val df = g.select(s"SELECT ($expr AS ?r) WHERE { $where }")
    val r = df.select("r.v").collect()
    assert(r.length == 1, s"expected 1 row, got ${r.length}")
    Option(r(0).getString(0)).getOrElse("∅")
  }

  test("string functions") {
    assert(one("""SUBSTR("foobar", 4)""") == "bar")
    assert(one("""SUBSTR("foobar", 2, 3)""") == "oob")
    assert(one("""STRBEFORE("abc", "b")""") == "a")
    assert(one("""STRAFTER("abc", "b")""") == "c")
    assert(one("""STRAFTER("abc", "z")""") == "")
    assert(one("""STRBEFORE("abc", "")""") == "")
    assert(one("""CONCAT("a", "b", "c")""") == "abc")
    assert(one("""ENCODE_FOR_URI("Los Angeles")""") == "Los%20Angeles")
    // XPath unreserved set: '~' kept, '*' escaped (unlike Java form-encoding)
    assert(one("""ENCODE_FOR_URI("~a*b_c.d-e")""") == "~a%2Ab_c.d-e")
    assert(one("""REPLACE("banana", "a.", "o")""") == "booa")
    assert(one("""MD5("abc")""") == "900150983cd24fb0d6963f7d28e17f72")
    assert(one("""UCASE("aB")""") == "AB")
  }

  test("argument-compatibility errors are unbound") {
    // second arg language-tagged but first plain → error (17.4.3.1)
    assert(one("""CONTAINS("abc", "b"@en)""") == "∅")
    assert(one("""STRSTARTS("abc"@en, "a"@fr)""") == "∅")
    // same language is fine
    assert(one("""CONTAINS("abc"@en, "b"@en)""") == "true")
  }

  test("numeric functions preserve datatype family") {
    val df = g.select(
      s"""SELECT (ABS(?n) AS ?a) (CEIL(?n) AS ?c) (FLOOR(?n) AS ?f) (ROUND(?n) AS ?r)
         |WHERE { <${EX}n> <${EX}v> ?n }""".stripMargin)
    val row = df.select("a.v", "a.dt", "c.v", "f.v", "r.v").collect()(0)
    assert(row.getString(0) == "3.75" && row.getString(1).endsWith("decimal"))
    assert(row.getString(2) == "-3")
    assert(row.getString(3) == "-4")
    assert(row.getString(4) == "-4" || row.getString(4) == "-3.5") // round(-3.75) = -4 (half up toward +inf)
  }

  test("invalid numeric lexical behaves as error") {
    val df = g.select(s"""SELECT (?m + 1 AS ?r) WHERE { <${EX}m> <${EX}v> ?m }""")
    assert(df.select("r").collect()(0).isNullAt(0))
  }

  test("date/time accessors use the lexical timezone") {
    val df = g.select(
      s"""SELECT (YEAR(?w) AS ?y) (MONTH(?w) AS ?mo) (DAY(?w) AS ?d) (HOURS(?w) AS ?h)
         |       (MINUTES(?w) AS ?mi) (SECONDS(?w) AS ?sec) (TZ(?w) AS ?tz)
         |WHERE { <${EX}d> <${EX}when> ?w }""".stripMargin)
    val r = df.select("y.v", "mo.v", "d.v", "h.v", "mi.v", "sec.v", "tz.v").collect()(0)
    assert(r.getString(0) == "2011" && r.getString(1) == "1" && r.getString(2) == "10")
    assert(r.getString(3) == "14" && r.getString(4) == "45")
    assert(r.getString(5) == "13.815")
    assert(r.getString(6) == "-05:00")
  }

  test("casts follow XPath rules, not SQL") {
    assert(one(s"""xsd:integer("4.5")""") == "∅") // must error, SQL would give 4
    assert(one(s"""xsd:integer("4")""") == "4")
    assert(one(s"""xsd:integer(4.9)""") == "4") // numeric truncates
    assert(one(s"""xsd:boolean("1")""") == "true")
    assert(one(s"""xsd:boolean("yes")""") == "∅")
    assert(one(s"""xsd:double("1.5e3")""") == "1500")
    assert(one(s"""xsd:string(<${EX}x>)""") == EX + "x")
    assert(one(s"""xsd:decimal("bad")""") == "∅")
  }

  test("term constructors and accessors") {
    assert(one(s"""DATATYPE("x")""") == XSD + "string")
    assert(one("""DATATYPE("x"@en)""") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString")
    assert(one("""LANG("x")""") == "")
    assert(one(s"""IRI("${EX}new")""") == EX + "new")
    assert(one(s"""STRDT("5", xsd:integer)""", s"?s <${EX}p> ?o") == "5")
    assert(one("""STRLANG("hi", "EN")""") == "hi")
    assert(one("""ISNUMERIC(42)""") == "true")
    assert(one("""ISNUMERIC("42")""") == "false")
    assert(one(s"""SAMETERM("1"^^xsd:integer, "01"^^xsd:integer)""") == "false")
    assert(one(s"""("1"^^xsd:integer = "01"^^xsd:integer)""") == "true")
  }

  test("3-valued logic with errors") {
    // error || true = true; error && false = false; error || false = error
    assert(one("""(?unbound > 1 || true)""") == "true")
    assert(one("""(?unbound > 1 && false)""") == "false")
    assert(one("""(?unbound > 1 || false)""") == "∅")
    assert(one("""(!BOUND(?unbound))""") == "true")
  }

  test("aggregate type ladder and error poisoning") {
    val data = Graft(NTriples.fromString(spark,
      s"""<${EX}a> <${EX}v> "1"^^<${XSD}integer> .
         |<${EX}b> <${EX}v> "2.5"^^<${XSD}decimal> .
         |<${EX}c> <${EX}v> "2e0"^^<${XSD}double> .
         |<${EX}z> <${EX}w> "oops" .
         |""".stripMargin))
    // int + decimal + double → double result
    val s1 = data.select(s"SELECT (SUM(?v) AS ?s) WHERE {{ ?x <${EX}v> ?v }}")
    val r1 = s1.select("s.v", "s.dt").collect()(0)
    assert(r1.getString(0) == "5.5" && r1.getString(1).endsWith("double"))
    // non-numeric input poisons SUM → unbound
    val s2 = data.select(s"SELECT (SUM(?v) AS ?s) WHERE {{ ?x ?p ?v }}")
    assert(s2.select("s").collect()(0).isNullAt(0))
    // but COUNT is fine
    val s3 = data.select(s"SELECT (COUNT(?v) AS ?c) WHERE {{ ?x ?p ?v }}")
    assert(s3.select("c.v").collect()(0).getString(0) == "4")
  }
}
