package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.encoding.TermCols
import graft.model.Xsd

/**
 * SPARQL result serialisation — XML (SRX), JSON (SRJ), CSV, TSV — over a
 * PlainTerm-struct result DataFrame. Mirrors the reference's result formats
 * (query results surface lib/execution/src/results/, format test suites
 * testsuite/tests/sparql.rs:72-92).
 *
 * EVERY format renders distributed: `to*Lines` produce one serialised row
 * fragment per solution as a single-column DataFrame (codegen'd column
 * expressions, `df.write.text`-ready). The HTTP server streams these
 * partition-by-partition (`toLocalIterator`) under chunked transfer, so a
 * big SELECT never materialises on the driver; the `*String` conveniences
 * assemble the same lines into one document for small/embedded use.
 */
object Results {

  // ---------------------------------------------------------------- escaping

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Column-expression JSON string escape (same mapping as [[jsonEscape]]):
    * backslash and quote, short escapes for \n\r\t, \u00XX for the other C0
    * control characters. The 29-replace control-char ladder only runs on
    * rows that actually contain one (single rlike guard) — the common case
    * pays 5 replaces. */
  private def jsonEscCol(c: Column): Column = {
    def basic(e: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        e, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
    val rare = (0 until 32).filterNot(i => i == 9 || i == 10 || i == 13).foldLeft(basic(c))((acc, i) =>
      regexp_replace(acc, f"\\x{$i%02x}", "\\\\" + f"u$i%04x"))
    when(c.rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"), rare).otherwise(basic(c))
  }

  private def xmlEscCol(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;")

  // --------------------------------------------------------------------- SRX

  /** SRX document prologue: XML declaration + head of variables. */
  def xmlHead(vars: Seq[String]): String =
    "<?xml version=\"1.0\"?>\n<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">\n<head>" +
      vars.map(v => s"""<variable name="${xmlEscape(v)}"/>""").mkString +
      "</head>\n<results>\n"

  val XmlTail: String = "</results>\n</sparql>\n"

  /** One `<result>…</result>` element per solution, rendered distributed. */
  def toXmlLines(df: DataFrame): DataFrame = {
    val frags = df.columns.map { v =>
      val c = col(v)
      val lex = xmlEscCol(TermCols.value(c))
      val inner =
        when(TermCols.isIri(c), concat(lit("<uri>"), lex, lit("</uri>")))
          .when(TermCols.isBlank(c), concat(lit("<bnode>"), lex, lit("</bnode>")))
          .when(TermCols.langTag(c).isNotNull,
            concat(lit("<literal xml:lang=\""), TermCols.langTag(c), lit("\">"), lex, lit("</literal>")))
          .when(TermCols.datatypeRaw(c).isNotNull && TermCols.datatypeRaw(c) =!= Xsd.string,
            concat(lit("<literal datatype=\""), xmlEscCol(TermCols.datatypeRaw(c)), lit("\">"), lex, lit("</literal>")))
          .otherwise(concat(lit("<literal>"), lex, lit("</literal>")))
      when(c.isNull, lit(null).cast(StringType)).otherwise(
        concat(lit(s"""<binding name="${xmlEscape(v)}">"""), inner, lit("</binding>")))
    }
    df.select(concat(lit("<result>"), concat_ws("", frags.toSeq: _*), lit("</result>")).as("value"))
  }

  /** SPARQL Query Results XML (https://www.w3.org/TR/rdf-sparql-XMLres/). */
  def toXml(df: DataFrame): String =
    xmlHead(df.columns.toSeq) +
      toXmlLines(df).collect().map(_.getString(0) + "\n").mkString + XmlTail

  def booleanXml(b: Boolean): String =
    s"""<?xml version="1.0"?>\n<sparql xmlns="http://www.w3.org/2005/sparql-results#"><head/><boolean>$b</boolean></sparql>\n"""

  // --------------------------------------------------------------------- SRJ

  /** SRJ document prologue: head of variables, opening the bindings array. */
  def jsonHead(vars: Seq[String]): String =
    """{"head":{"vars":[""" + vars.map(v => "\"" + jsonEscape(v) + "\"").mkString(",") +
      """]},"results":{"bindings":["""

  val JsonTail: String = "]}}"

  /** One JSON binding object per solution (no separators), rendered
    * distributed; join with ',' between [[jsonHead]] and [[JsonTail]]. */
  def toJsonLines(df: DataFrame): DataFrame = {
    val frags = df.columns.map { v =>
      val c = col(v)
      val lex = jsonEscCol(TermCols.value(c))
      val inner =
        when(TermCols.isIri(c), concat(lit("\"type\":\"uri\",\"value\":\""), lex, lit("\"")))
          .when(TermCols.isBlank(c), concat(lit("\"type\":\"bnode\",\"value\":\""), lex, lit("\"")))
          .otherwise(concat(
            lit("\"type\":\"literal\",\"value\":\""), lex, lit("\""),
            when(TermCols.langTag(c).isNotNull,
              concat(lit(",\"xml:lang\":\""), TermCols.langTag(c), lit("\"")))
              .when(TermCols.datatypeRaw(c).isNotNull && TermCols.datatypeRaw(c) =!= Xsd.string,
                concat(lit(",\"datatype\":\""), jsonEscCol(TermCols.datatypeRaw(c)), lit("\"")))
              .otherwise(lit(""))))
      when(c.isNull, lit(null).cast(StringType)).otherwise(
        concat(lit("\"" + jsonEscape(v) + "\":{"), inner, lit("}")))
    }
    df.select(concat(lit("{"), concat_ws(",", frags.toSeq: _*), lit("}")).as("value"))
  }

  /** SPARQL Query Results JSON (https://www.w3.org/TR/sparql11-results-json/). */
  def toJson(df: DataFrame): String =
    jsonHead(df.columns.toSeq) +
      toJsonLines(df).collect().map(_.getString(0)).mkString(",") + JsonTail

  def booleanJson(b: Boolean): String = s"""{"head":{},"boolean":$b}"""

  // ----------------------------------------------------------------- CSV/TSV

  /** CSV (values only, RFC 4180 quoting) as a distributed single-column DF —
    * write with `.write.text(...)`. Header row must be prepended by caller
    * (or use [[csvString]] for a driver-side document). */
  def toCsvLines(df: DataFrame): DataFrame = {
    val cells = df.columns.map { c =>
      val v = TermCols.value(col(c))
      val needsQuote = v.contains(",") || v.contains("\"") || v.contains("\n")
      when(col(c).isNull, lit(""))
        .otherwise(when(needsQuote,
          concat(lit("\""), regexp_replace(v, "\"", "\"\""), lit("\""))).otherwise(v))
    }
    df.select(concat_ws(",", cells: _*).as("value"))
  }

  /** TSV with full term syntax (SPARQL 1.1 TSV results format). */
  def toTsvLines(df: DataFrame): DataFrame = {
    def fmt(c: org.apache.spark.sql.Column) = {
      val esc = regexp_replace(regexp_replace(regexp_replace(
        TermCols.value(c), "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n")
      when(c.isNull, lit(""))
        .when(TermCols.isIri(c), concat(lit("<"), TermCols.value(c), lit(">")))
        .when(TermCols.isBlank(c), concat(lit("_:"), TermCols.value(c)))
        .when(TermCols.langTag(c).isNotNull,
          concat(lit("\""), esc, lit("\"@"), TermCols.langTag(c)))
        .when(TermCols.datatypeRaw(c).isNotNull && TermCols.datatypeRaw(c) =!= Xsd.string,
          concat(lit("\""), esc, lit("\"^^<"), TermCols.datatypeRaw(c), lit(">")))
        .otherwise(concat(lit("\""), esc, lit("\"")))
    }
    df.select(concat_ws("\t", df.columns.map(c => fmt(col(c))): _*).as("value"))
  }

  def csvString(df: DataFrame): String =
    (df.columns.mkString(",") +: toCsvLines(df).collect().map(_.getString(0)).toSeq).mkString("\r\n") + "\r\n"

  def tsvString(df: DataFrame): String =
    (df.columns.map("?" + _).mkString("\t") +: toTsvLines(df).collect().map(_.getString(0)).toSeq).mkString("\n") + "\n"

  // ------------------------------------------------------------------ readers

  /** Parsed result document: either an ASK boolean or (vars, solutions). */
  sealed trait ReadResult
  final case class ReadBoolean(value: Boolean) extends ReadResult
  final case class ReadSolutions(vars: Seq[String],
                                 rows: Seq[Map[String, graft.model.RdfTerm]]) extends ReadResult

  private def requireDistinctVars(vars: Seq[String]): Unit =
    require(vars.distinct.size == vars.size,
      s"duplicated variable names in result head: ${vars.mkString(", ")}")

  /**
   * SPARQL Results JSON reader (the sparesults counterpart of [[toJson]]).
   * Tolerates unknown keys and a head that follows the results (tree parse);
   * rejects duplicated variable names; accepts the legacy "typed-literal"
   * term type.
   */
  def readJson(text: String): ReadResult = {
    import graft.model._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
    if (root.has("boolean")) return ReadBoolean(root.get("boolean").asBoolean)
    val head = root.get("head")
    require(head != null && head.has("vars"), "missing head.vars")
    val vars = (0 until head.get("vars").size).map(head.get("vars").get(_).asText)
    requireDistinctVars(vars)
    val bindings = Option(root.get("results")).flatMap(r => Option(r.get("bindings")))
      .getOrElse(throw new IllegalArgumentException("missing results.bindings"))
    val rows = (0 until bindings.size).map { i =>
      val b = bindings.get(i)
      val names = b.fieldNames()
      var m = Map.empty[String, RdfTerm]
      while (names.hasNext) {
        val n = names.next()
        val t = b.get(n)
        val v = t.get("value").asText
        val term: RdfTerm = t.get("type").asText match {
          case "uri" => Iri(v)
          case "bnode" => BNode(v)
          case "literal" | "typed-literal" =>
            val lang = Option(t.get("xml:lang")).map(_.asText)
            val dt = Option(t.get("datatype")).map(_.asText)
            Lit(v, if (lang.isDefined) Rdf.langString else dt.getOrElse(Xsd.string), lang)
          case other => throw new IllegalArgumentException(s"unknown term type '$other'")
        }
        m += (n -> term)
      }
      m
    }
    ReadSolutions(vars, rows)
  }

  /** SPARQL Results TSV reader: header of ?vars (duplicates rejected), one
    * N-Triples-syntax term per cell, empty cell = unbound. */
  def readTsv(text: String): ReadResult = {
    import graft.model._
    val lines = text.linesIterator.toSeq
    require(lines.nonEmpty, "empty TSV results document")
    val vars = lines.head.split("\t", -1).toSeq.map { cell =>
      require(cell.startsWith("?") || cell.startsWith("$"),
        s"TSV header cell must be a variable: '$cell'")
      val v = cell.substring(1)
      require(v.nonEmpty && !v.exists(c => c.isWhitespace || c == '?' || c == '$'),
        s"invalid variable name '$cell'")
      v
    }
    requireDistinctVars(vars)
    val rows = lines.tail.filter(_.nonEmpty).map { line =>
      val cells = line.split("\t", -1).toSeq
      vars.zip(cells).collect {
        case (v, cell) if cell.nonEmpty => v -> parseTsvTerm(cell)
      }.toMap
    }
    ReadSolutions(vars, rows)
  }

  private def parseTsvTerm(cell: String): graft.model.RdfTerm = {
    import graft.model._
    val c = cell.trim
    if (c.startsWith("<") || c.startsWith("_:") || c.startsWith("\""))
      graft.sources.NTriples.parseTermString(c)
    else if (c == "true" || c == "false") Lit(c, Xsd.boolean, None)
    else if (c.matches("[+-]?\\d+")) Lit(c, Xsd.integer, None)
    else if (c.matches("[+-]?\\d*\\.\\d+")) Lit(c, Xsd.decimal, None)
    else if (c.matches("[+-]?\\d[\\d.]*[eE][+-]?\\d+")) Lit(c, Xsd.double, None)
    // anything else is not a valid Turtle-syntax term — reject, matching the
    // reference's sparesults TSV reader (a bare word is NOT a string literal)
    else throw new IllegalArgumentException(s"invalid TSV term: '$cell'")
  }
}