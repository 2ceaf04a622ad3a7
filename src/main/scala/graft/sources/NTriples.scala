package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.encoding.TermCols
import graft.model._

/**
 * N-Triples / N-Quads reader and writer.
 *
 * The reference loads RDF through oxrdfio parsers into its quad store
 * (/root/reference/lib/rdf-fusion/src/store.rs:477-514). Line-oriented
 * N-Triples/N-Quads are embarrassingly parallel, so on Spark we parse inside
 * `mapPartitions` over `spark.read.textFile` — each input split parses
 * independently on its executor; no driver-side work, scales linearly with
 * input size.
 *
 * Output schema = the quad relation (graph | subject | predicate | object),
 * each column a PlainTerm struct, graph NULL = default graph
 * (lib/encoding/src/quad_storage_encoding.rs:26-33).
 */
object NTriples {

  val quadSchema: StructType = StructType(Seq(
    StructField("graph", TermCols.schema, nullable = true),
    StructField("subject", TermCols.schema, nullable = false),
    StructField("predicate", TermCols.schema, nullable = false),
    StructField("object", TermCols.schema, nullable = false)))

  /** Read an N-Triples (or N-Quads when `quads=true`) file into a quads DF.
    * `lenient=true` recovers line-wise (the reference's parser-recovery
    * semantics): malformed lines are dropped, and a line whose terms parse
    * but lacks the final dot is kept. */
  def read(spark: SparkSession, path: String, quads: Boolean = false,
           lenient: Boolean = false): DataFrame = {
    val lines = spark.read.textFile(path)
    val parsed = lines.rdd.mapPartitions { it =>
      if (lenient) it.flatMap(parseLineRecovering) else it.flatMap(parseLine(_))
    }
    import org.apache.spark.sql.Row
    val rows = parsed.map { q =>
      Row(q.graph.map(termRow).orNull, termRow(q.subject), termRow(q.predicate), termRow(q.obj))
    }
    spark.createDataFrame(rows, quadSchema)
  }

  /** Parse N-Triples/N-Quads text already on the driver (small data / tests). */
  def fromString(spark: SparkSession, text: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows: java.util.List[org.apache.spark.sql.Row] =
      text.linesIterator.flatMap(parseLine(_)).map(quadRow).toList.asJava
    spark.createDataFrame(rows, quadSchema)
  }

  private[graft] def quadRow(q: RdfQuad): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(q.graph.map(termRow).orNull, termRow(q.subject),
      termRow(q.predicate), termRow(q.obj))

  private def termRow(t: RdfTerm): org.apache.spark.sql.Row = t match {
    case Iri(v) => org.apache.spark.sql.Row(TermType.Iri, v, null, null, null)
    case BNode(v) => org.apache.spark.sql.Row(TermType.BlankNode, v, null, null, null)
    case Lit(v, dt, lang) =>
      org.apache.spark.sql.Row(TermType.Literal, v,
        if (dt == Xsd.string && lang.isEmpty) null else dt, lang.orNull,
        numOf(v, dt))
  }

  /** Pre-decoded numeric field (see TermCols.schema). */
  private[graft] def numOf(v: String, dt: String): java.lang.Double =
    if (dt != null && Xsd.numericTypes.contains(dt))
      try java.lang.Double.valueOf(v.trim.toDouble) catch { case _: NumberFormatException => null }
    else null

  /** Parse one N-Triples/N-Quads line → quad. Comments/blank lines → None.
    * Malformed lines raise (strict, like the reference's parser);
    * `requireDot=false` accepts a complete triple missing its final dot
    * (recovery semantics). */
  def parseLine(raw: String, requireDot: Boolean = true): Option[RdfQuad] = {
    val line = raw.trim
    if (line.isEmpty || line.startsWith("#")) return None
    val p = new NtParser(line)
    val s = p.term()
    val pr = p.term() match {
      case i: Iri => i
      case other => throw new IllegalArgumentException(s"predicate must be IRI, got $other in: $line")
    }
    val o = p.term()
    val g = p.optTerm()
    if (requireDot) p.expectDot()
    Some(RdfQuad(g, s, pr, o))
  }

  /** Line-wise recovery (reference oxigraph-tests/parser-recovery): bad
    * lines → None; complete triples without the final dot are kept. */
  def parseLineRecovering(raw: String): Option[RdfQuad] =
    try parseLine(raw, requireDot = false)
    catch { case _: Exception => None }

  /** One term in N-Triples syntax (for TSV result cells etc.). */
  def parseTermString(s: String): RdfTerm =
    new NtParser(s.trim).term()

  /** Hand-rolled single-line scanner — no regex backtracking in the hot loop. */
  private final class NtParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && (s(i) == ' ' || s(i) == '\t')) i += 1

    def term(): RdfTerm = {
      ws()
      optTerm().getOrElse(throw new IllegalArgumentException(s"expected term at $i in: $s"))
    }

    def optTerm(): Option[RdfTerm] = {
      ws()
      if (i >= s.length) return None
      s(i) match {
        case '<' =>
          val e = s.indexOf('>', i)
          require(e > 0, s"unterminated IRI at $i")
          val v = s.substring(i + 1, e); i = e + 1
          require(v.forall(validIriChar), s"illegal character in IRI <$v>")
          Some(Iri(unescape(v)))
        case '_' =>
          require(i + 1 < s.length && s(i + 1) == ':', s"bad bnode at $i")
          var j = i + 2
          while (j < s.length && !Character.isWhitespace(s(j))) j += 1
          val v = s.substring(i + 2, j); i = j
          require(v.nonEmpty && v.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
            s"illegal blank node label '_:$v'")
          Some(BNode(v))
        case '"' =>
          var j = i + 1
          val sb = new StringBuilder
          while (s(j) != '"') {
            if (s(j) == '\\') { sb.append(s(j)).append(s(j + 1)); j += 2 }
            else { sb.append(s(j)); j += 1 }
          }
          val lex = unescape(sb.result()); i = j + 1
          if (i < s.length && s(i) == '@') {
            var k = i + 1
            while (k < s.length && (s(k).isLetterOrDigit || s(k) == '-')) k += 1
            val lang = s.substring(i + 1, k); i = k
            require(wellFormedLangTag(lang), s"ill-formed language tag '@$lang'")
            Some(Lit(lex, Rdf.langString, Some(lang.toLowerCase)))
          } else if (i + 1 < s.length && s(i) == '^' && s(i + 1) == '^') {
            i += 2
            require(s(i) == '<', "expected datatype IRI")
            val e = s.indexOf('>', i)
            val dt = s.substring(i + 1, e); i = e + 1
            Some(Lit(lex, unescape(dt), None))
          } else Some(Lit(lex, Xsd.string, None))
        case '.' => None
        case _ => throw new IllegalArgumentException(s"unexpected char '${s(i)}' at $i in: $s")
      }
    }

    def expectDot(): Unit = {
      ws()
      require(i < s.length && s(i) == '.', s"expected '.' at $i in: $s")
    }
  }

  /** N-Triples IRIREF character set: no controls/space and none of
    * <>"{}|^` (backslash only introduces \u escapes, checked later). */
  private[graft] def validIriChar(c: Char): Boolean =
    c > ' ' && c != '<' && c != '>' && c != '"' && c != '{' && c != '}' &&
      c != '|' && c != '^' && c != '`'

  /** Exactly n hex digits (parseInt alone would accept a '+' sign). */
  private def hexDigits(v: String, at: Int, n: Int): String = {
    val sub = v.substring(at, at + n)
    require(sub.forall(c => Character.digit(c, 16) >= 0), s"bad unicode escape '$sub'")
    sub
  }

  /** BCP47 well-formedness (as far as Turtle/N-Triples require): subtags of
    * 1-8 alphanumerics, primary subtag alphabetic (oxigraph validates via
    * oxilangtag and rejects e.g. 14-letter primary tags). */
  private[graft] def wellFormedLangTag(t: String): Boolean = {
    val parts = t.split("-", -1)
    parts.nonEmpty && parts.head.nonEmpty && parts.head.length <= 8 &&
      parts.head.forall(_.isLetter) &&
      parts.tail.forall(p => p.nonEmpty && p.length <= 8 && p.forall(_.isLetterOrDigit))
  }

  private[graft] def unescape(v: String): String = {
    if (v.indexOf('\\') < 0) return v
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v(i)
      if (c == '\\' && i + 1 < v.length) {
        v(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' => sb.append(Integer.parseInt(hexDigits(v, i + 2, 4), 16).toChar); i += 6
          case 'U' =>
            sb.appendAll(Character.toChars(Integer.parseInt(hexDigits(v, i + 2, 8), 16))); i += 10
          case other =>
            throw new IllegalArgumentException(s"illegal escape sequence '\\$other'")
        }
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  // ------------------------------------------------------------------ writer

  /** Serialise a quads DF to N-Quads lines (one string column), ready for
    * `df.write.text(...)` — distributed, no driver collection
    * (reference: Store::dump_to_writer, lib/rdf-fusion/src/store.rs:586-657). */
  /** N-Triples text form of a term column (also valid Turtle/TriG). */
  def termText(c: Column): Column = {
    val esc = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      TermCols.value(c), "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")
    when(TermCols.isIri(c), concat(lit("<"), TermCols.value(c), lit(">")))
      .when(TermCols.isBlank(c), concat(lit("_:"), TermCols.value(c)))
      .when(TermCols.langTag(c).isNotNull,
        concat(lit("\""), esc, lit("\"@"), TermCols.langTag(c)))
      .when(TermCols.datatypeRaw(c).isNotNull && TermCols.datatypeRaw(c) =!= Xsd.string,
        concat(lit("\""), esc, lit("\"^^<"), TermCols.datatypeRaw(c), lit(">")))
      .otherwise(concat(lit("\""), esc, lit("\"")))
  }

  def toNQuadLines(quads: DataFrame): DataFrame = {
    // concat_ws skips NULL elements, so default-graph rows get no extra gap.
    quads.select(concat_ws(" ",
      termText(col("subject")), termText(col("predicate")), termText(col("object")),
      when(col("graph").isNotNull, termText(col("graph"))),
      lit(".")).as("value"))
  }
}
