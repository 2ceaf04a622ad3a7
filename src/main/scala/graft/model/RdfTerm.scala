package graft.model

/**
 * RDF term model.
 *
 * Mirrors the term algebra of the reference engine (see
 * /root/reference/lib/model/src/lib.rs:28-37, which re-exports oxrdf's
 * NamedNode / BlankNode / Literal), re-expressed as a small Scala ADT.
 * Terms are value objects; all heavy lifting happens columnar-side (see
 * [[graft.encoding.TermCols]]).
 */
sealed trait RdfTerm {
  def termType: Byte
}

/** An IRI. term_type = 0 (reference: lib/encoding/src/plain_term/encoding.rs:108-129). */
final case class Iri(value: String) extends RdfTerm {
  override def termType: Byte = TermType.Iri
  override def toString: String = s"<$value>"
}

/** A blank node. term_type = 1. */
final case class BNode(id: String) extends RdfTerm {
  override def termType: Byte = TermType.BlankNode
  override def toString: String = s"_:$id"
}

/**
 * A literal: lexical form + datatype IRI + optional language tag.
 * `datatype == null`/xsd:string means a simple literal; a language-tagged
 * string has datatype rdf:langString.
 */
final case class Lit(lexical: String, datatype: String, lang: Option[String]) extends RdfTerm {
  override def termType: Byte = TermType.Literal
  override def toString: String = lang match {
    case Some(l) => s""""$lexical"@$l"""
    case None if datatype == null || datatype == Xsd.string => s""""$lexical""""
    case None => s""""$lexical"^^<$datatype>"""
  }
}

object Lit {
  def simple(s: String): Lit = Lit(s, Xsd.string, None)
  def typed(s: String, dt: String): Lit = Lit(s, dt, None)
  def langString(s: String, lang: String): Lit = Lit(s, Rdf.langString, Some(lang.toLowerCase))
  def boolean(b: Boolean): Lit = Lit(if (b) "true" else "false", Xsd.boolean, None)
  def integer(i: Long): Lit = Lit(i.toString, Xsd.integer, None)
  def double(d: Double): Lit = Lit(d.toString, Xsd.double, None)
  def decimal(d: BigDecimal): Lit = Lit(d.bigDecimal.toPlainString, Xsd.decimal, None)
}

object TermType {
  val Iri: Byte = 0
  val BlankNode: Byte = 1
  val Literal: Byte = 2
}

/** XSD datatype IRIs (reference: lib/model/src/xsd/ — boolean.rs, decimal.rs, …). */
object Xsd {
  private val ns = "http://www.w3.org/2001/XMLSchema#"
  val string: String = ns + "string"
  val boolean: String = ns + "boolean"
  val integer: String = ns + "integer"
  val int: String = ns + "int"
  val long: String = ns + "long"
  val short: String = ns + "short"
  val byte_ : String = ns + "byte"
  val decimal: String = ns + "decimal"
  val float: String = ns + "float"
  val double: String = ns + "double"
  val dateTime: String = ns + "dateTime"
  val date: String = ns + "date"
  val time: String = ns + "time"
  val duration: String = ns + "duration"
  val dayTimeDuration: String = ns + "dayTimeDuration"
  val yearMonthDuration: String = ns + "yearMonthDuration"
  val nonNegativeInteger: String = ns + "nonNegativeInteger"
  val nonPositiveInteger: String = ns + "nonPositiveInteger"
  val negativeInteger: String = ns + "negativeInteger"
  val positiveInteger: String = ns + "positiveInteger"
  val unsignedLong: String = ns + "unsignedLong"
  val unsignedInt: String = ns + "unsignedInt"
  val unsignedShort: String = ns + "unsignedShort"
  val unsignedByte: String = ns + "unsignedByte"
  val anyURI: String = ns + "anyURI"

  /** All datatypes whose values participate in the SPARQL numeric promotion
    * ladder Int → Integer → Decimal → Float → Double
    * (reference: lib/model/src/xsd/numeric.rs). */
  val numericTypes: Seq[String] = Seq(
    integer, int, long, short, byte_, decimal, float, double,
    nonNegativeInteger, nonPositiveInteger, negativeInteger, positiveInteger,
    unsignedLong, unsignedInt, unsignedShort, unsignedByte)
}

object Rdf {
  private val ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val langString: String = ns + "langString"
  val type_ : String = ns + "type"
  val first: String = ns + "first"
  val rest: String = ns + "rest"
  val nil: String = ns + "nil"
}

/** A quad: graph is None for the default graph. */
final case class RdfQuad(graph: Option[RdfTerm], subject: RdfTerm, predicate: Iri, obj: RdfTerm)
