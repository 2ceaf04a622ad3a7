package graft.encoding

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{Rdf, TermType, Xsd}

/**
 * Columnar encoding of RDF terms.
 *
 * The reference keeps four Arrow encodings of terms (PlainTerm / TypedValue /
 * ObjectId / SortableTerm — /root/reference/lib/encoding/src/lib.rs:18-25).
 * On Spark we standardise on **one** physical struct — PlainTerm — and derive
 * the other views as Catalyst column expressions on demand:
 *
 *  - typed views (numeric value, boolean, dateTime) are computed per-operation
 *    with `when`/`cast` chains over the datatype IRI — these stay inside
 *    whole-stage codegen, so there is no materialisation cost;
 *  - the sortable view ([[sortKey]]) is a struct Spark orders field-wise,
 *    mirroring the reference's SortableTerm workaround
 *    (lib/encoding/src/sortable_term/encoding.rs:13-60);
 *  - the dictionary (ObjectId) encoding is unnecessary: Spark joins on the
 *    struct directly (Tungsten hashes the struct bytes), and a distributed
 *    shared mutable id-mapping would be an anti-pattern at 100 TB.
 *
 * PlainTerm struct (matches lib/encoding/src/plain_term/encoding.rs:17-76):
 * {{{
 *   STRUCT<t: TINYINT, v: STRING, dt: STRING, lang: STRING>
 *   t: 0 = IRI, 1 = blank node, 2 = literal
 *   dt / lang: only set for literals; dt null on simple literals
 * }}}
 * An *unbound* variable is a NULL struct.
 */
object TermCols {

  val schema: StructType = StructType(Seq(
    StructField("t", ByteType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("dt", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    // pre-decoded numeric value — the Spark analogue of the reference's
    // TypedValue encoding (lib/encoding/src/typed_value/): parsing the
    // lexical form once at construction keeps comparisons/arithmetic/sort
    // off the string-parse path (measured ~3x on numeric-heavy joins+aggs)
    StructField("num", DoubleType, nullable = true)))

  // ---------------------------------------------------------------- builders

  private val nullStr = lit(null).cast(StringType)

  private val nullNum = lit(null).cast(DoubleType)

  private def mk(t: Column, v: Column, dt: Column, lang: Column, num: Column): Column =
    struct(t.as("t"), v.cast(StringType).as("v"), dt.cast(StringType).as("dt"),
      lang.cast(StringType).as("lang"), num.cast(DoubleType).as("num"))

  /** IRI term from a string column. */
  def iri(v: Column): Column =
    mk(lit(TermType.Iri), v, nullStr, nullStr, nullNum)

  def iri(v: String): Column = iri(lit(v))

  /** Blank node term from an id column. */
  def bnode(v: Column): Column =
    mk(lit(TermType.BlankNode), v, nullStr, nullStr, nullNum)

  /** Typed literal; numeric datatypes get the pre-decoded num field.
    * (v goes through string for the num parse: the branch is analysed even
    * when the datatype can never be numeric, and e.g. TIMESTAMP → DOUBLE
    * is not a valid cast.) */
  def literal(v: Column, dt: Column, lang: Column): Column =
    mk(lit(TermType.Literal), v, dt, lang,
      when(coalesce(dt.isin(Xsd.numericTypes: _*), lit(false)),
        v.cast(StringType).try_cast(DoubleType)).otherwise(nullNum))

  def typedLit(v: Column, dt: String): Column = literal(v, lit(dt), nullStr)

  /** Simple literal (xsd:string). Canonical physical form stores dt = NULL
    * (RDF 1.1: simple literal ≡ xsd:string) so struct equality/joins work
    * across sources; DATATYPE() reconstructs xsd:string via [[datatype]]. */
  def str(v: Column): Column = literal(v, nullStr, nullStr)

  def langStr(v: Column, lang: Column): Column =
    literal(v, lit(Rdf.langString), lower(lang))

  /** Native boolean column → xsd:boolean term; NULL propagates to unbound. */
  def fromBoolean(b: Column): Column =
    when(b.isNull, nullTerm).otherwise(typedLit(when(b, "true").otherwise("false"), Xsd.boolean))

  // NULL input (e.g. an unparseable operand) propagates to the unbound/error
  // term, never to a literal struct with a NULL value
  def fromLong(c: Column): Column = when(c.isNull, nullTerm).otherwise(fromLongRaw(c))
  def fromDouble(c: Column): Column = when(c.isNull, nullTerm).otherwise(fromDoubleRaw(c))
  def fromDecimal(c: Column): Column = when(c.isNull, nullTerm).otherwise(fromDecimalRaw(c))

  /** xsd:float term from a (double-precision) numeric column: the value is
    * rounded through FloatType (XPath float arithmetic is single-precision)
    * and the datatype stays xsd:float per the XPath promotion ladder —
    * float op {integer,decimal,float} → float, never double. */
  def fromFloat(c: Column): Column = {
    val f = c.cast(FloatType)
    // see dblToLexical: specials dodge the ANSI long-cast throw and render
    // the XSD canonical forms
    val lex = when(isnan(f), lit("NaN"))
      .when(f === Float.PositiveInfinity, lit("INF"))
      .when(f === Float.NegativeInfinity, lit("-INF"))
      .when(abs(f) < 1e15f && f === f.cast(LongType).cast(FloatType),
        f.cast(LongType).cast(StringType))
      .otherwise(f.cast(StringType))
    when(c.isNull, nullTerm)
      .otherwise(mk(lit(TermType.Literal), lex, lit(Xsd.float), nullStr, f.cast(DoubleType)))
  }

  /** Unguarded constructors for bulk mapping paths where NULL source rows
    * are filtered separately — skips a per-term branch in codegen. */
  def fromLongRaw(c: Column): Column =
    mk(lit(TermType.Literal), c.cast(StringType), lit(Xsd.integer), nullStr, c.cast(DoubleType))
  def fromDoubleRaw(c: Column): Column =
    mk(lit(TermType.Literal), dblToLexical(c), lit(Xsd.double), nullStr, c.cast(DoubleType))
  def fromDecimalRaw(c: Column): Column =
    mk(lit(TermType.Literal), decToLexical(c), lit(Xsd.decimal), nullStr, c.cast(DoubleType))

  /** Decimal(36,16) → canonical lexical form: strip trailing zeros ("3.5000…0"
    * → "3.5", "4.0000…0" → "4"). */
  def decToLexical(c: Column): Column = {
    val s = c.cast(StringType)
    regexp_replace(regexp_replace(s, "(\\.\\d*?)0+$", "$1"), "\\.$", "")
  }

  /** xsd:dateTime term from a native timestamp column (UTC session TZ). */
  def fromTimestamp(c: Column): Column =
    typedLit(date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), Xsd.dateTime)

  /** NULL term struct (= unbound variable / propagated error). */
  def nullTerm: Column = lit(null).cast(schema)

  // --------------------------------------------------------------- accessors

  def termType(c: Column): Column = c.getField("t")
  def value(c: Column): Column = c.getField("v")
  def datatypeRaw(c: Column): Column = c.getField("dt")
  def langTag(c: Column): Column = c.getField("lang")

  def isIri(c: Column): Column = termType(c) === TermType.Iri
  def isBlank(c: Column): Column = termType(c) === TermType.BlankNode
  def isLiteral(c: Column): Column = termType(c) === TermType.Literal

  /** Effective datatype IRI of a literal: simple literals are xsd:string,
    * language-tagged strings rdf:langString (SPARQL DATATYPE semantics). */
  def datatype(c: Column): Column =
    when(!isLiteral(c), lit(null).cast(StringType))
      .otherwise(coalesce(datatypeRaw(c),
        when(langTag(c).isNotNull, Rdf.langString).otherwise(Xsd.string)))

  /** True when the literal's datatype is in the numeric promotion ladder.
    * NB coalesce: `isin` over a NULL datatype (simple literal) is NULL, not
    * false. */
  def isNumeric(c: Column): Column =
    isLiteral(c) && coalesce(datatypeRaw(c).isin(Xsd.numericTypes: _*), lit(false))

  /** Numeric value as double; NULL when not numeric or unparsable.
    * Cross-type numeric comparison and most arithmetic run on this view;
    * exact decimal paths use [[numDecimal]]. */
  def numDouble(c: Column): Column = c.getField("num")

  /** Numeric value as Decimal(36,16) — the reference's exact-decimal scale
    * (lib/model/src/xsd/decimal.rs:26-27). */
  def numDecimal(c: Column): Column =
    when(isNumeric(c), value(c).try_cast(DecimalType(36, 16)))
      .otherwise(lit(null).cast(DecimalType(36, 16)))

  /** True when the datatype is integer-family (no decimal/float/double). */
  def isIntegerTyped(c: Column): Column =
    isLiteral(c) && coalesce(datatypeRaw(c).isin(
      Seq(Xsd.integer, Xsd.int, Xsd.long, Xsd.short, Xsd.byte_,
        Xsd.nonNegativeInteger, Xsd.nonPositiveInteger, Xsd.negativeInteger,
        Xsd.positiveInteger, Xsd.unsignedLong, Xsd.unsignedInt,
        Xsd.unsignedShort, Xsd.unsignedByte): _*), lit(false))

  def isDecimalTyped(c: Column): Column = isLiteral(c) && datatypeRaw(c) === Xsd.decimal
  def isFloatTyped(c: Column): Column = isLiteral(c) && datatypeRaw(c) === Xsd.float
  /** Strictly xsd:double — [[isDoubleTyped]] is the double-DOMAIN umbrella
    * (double or float, both compare/compute in binary floating point). */
  def isStrictDoubleTyped(c: Column): Column = isLiteral(c) && datatypeRaw(c) === Xsd.double
  def isDoubleTyped(c: Column): Column =
    isLiteral(c) && coalesce(datatypeRaw(c).isin(Xsd.double, Xsd.float), lit(false))

  /** Boolean value of an xsd:boolean literal; NULL otherwise. */
  def boolValue(c: Column): Column =
    when(isLiteral(c) && datatypeRaw(c) === Xsd.boolean,
      when(value(c) === "true" || value(c) === "1", true)
        .when(value(c) === "false" || value(c) === "0", false))

  /** Timestamp value of an xsd:dateTime/xsd:date literal; NULL otherwise. */
  def tsValue(c: Column): Column =
    when(isLiteral(c) && datatypeRaw(c).isin(Xsd.dateTime, Xsd.date),
      try_to_timestamp(value(c)))

  // ------------------------------------------------------ time & durations
  //
  // These parse via native Catalyst expressions (XsdTemporalExprs.scala) —
  // one constant-size node each — NOT regexp_extract column chains: the
  // chains re-extract per component and Catalyst inlines the whole tree per
  // reference, which measurably blew plan-optimization time (minutes inside
  // ColumnPruning on BSBM) and pushed filters past the 64 KB codegen limit.

  /** Timeline value (seconds) of an xsd:time literal: seconds-of-day minus
    * the timezone offset — XPath compares times as dateTimes on one
    * reference date (reference: lib/model/src/xsd/date_time.rs `Time`
    * comparing via `timestamp().value()`). Timezone-less values take the
    * implicit UTC zone, consistent with this engine's xsd:dateTime handling
    * (the reference's ±14 h indeterminacy rule is the documented divergence
    * pinned by the dt_tz slice tests). NULL for non-time/ill-formed terms. */
  def timeValue(c: Column): Column =
    XsdTemporalCols.timeSeconds(value(c), datatypeRaw(c))

  /** Month component count of a duration-family literal (xsd:duration /
    * yearMonthDuration / dayTimeDuration — reference typed_value.rs compares
    * the three as one family); NULL for non-duration/ill-formed terms. */
  def durMonths(c: Column): Column =
    XsdTemporalCols.durationMonths(value(c), datatypeRaw(c))

  /** Second component (days+time, signed, fractional) of a duration-family
    * literal; NULL otherwise. Paired with [[durMonths]]. */
  def durSeconds(c: Column): Column =
    XsdTemporalCols.durationSeconds(value(c), datatypeRaw(c))

  /** Timeline probe for duration comparison: epoch seconds after adding the
    * duration to `refDate` (XSD month arithmetic = calendar add with
    * day-clamping, as java.time.LocalDate.plusMonths implements). The
    * reference orders durations by agreement across FOUR such probes
    * (lib/model/src/xsd/duration.rs:271-306 — dates chosen to span 28/30/31
    * day months); one probe alone is the engine's total-order tiebreak. */
  def durProbe(c: Column, refDate: String): Column =
    XsdTemporalCols.durationProbe(value(c), datatypeRaw(c), refDate)

  /** True for plain/xsd:string literals (no language tag). */
  def isSimpleString(c: Column): Column =
    isLiteral(c) && langTag(c).isNull &&
      (datatypeRaw(c).isNull || datatypeRaw(c) === Xsd.string)

  /** String-ish: simple string or language-tagged. */
  def isStringLit(c: Column): Column =
    isLiteral(c) && (datatypeRaw(c).isNull ||
      datatypeRaw(c).isin(Xsd.string, Rdf.langString))

  // ----------------------------------------------------------------- doubles

  /** SPARQL/Turtle lexical form for doubles: integral values print without
    * the trailing ".0" Java would add. Matches the reference's Display for
    * xsd:double closely enough for oracle comparison (values compared after
    * casting back to native types in verification queries). */
  private def dblToLexical(c: Column): Column = {
    val d = c.cast(DoubleType)
    // specials first: under ANSI mode NaN/±Inf → LongType THROWS, and the
    // XSD canonical lexicals are "NaN"/"INF"/"-INF" (not Java's "Infinity");
    // the range guard sits LEFT of the long-cast so And short-circuits it
    when(isnan(d), lit("NaN"))
      .when(d === Double.PositiveInfinity, lit("INF"))
      .when(d === Double.NegativeInfinity, lit("-INF"))
      .when(abs(d) < 1e15 && d === d.cast(LongType).cast(DoubleType),
        d.cast(LongType).cast(StringType))
      .otherwise(d.cast(StringType))
  }

  // ---------------------------------------------------------------- ordering

  /**
   * Sortable view for ORDER BY — a struct Spark orders field-wise, giving the
   * SPARQL total order (reference: lib/encoding/src/sortable_term/encoding.rs,
   * SPARQL 15.1): unbound < blank nodes < IRIs < literals; numeric literals
   * compare cross-type by value; strings by codepoint; booleans false<true;
   * dateTimes chronologically; remaining literals by (datatype, lexical).
   * Unbound terms rank as class 0 (lowest; DESC reverses to last).
   */
  def sortKey(c: Column): Column = {
    val cls =
      when(c.isNull, lit(0))
        .when(isBlank(c), lit(1))
        .when(isIri(c), lit(2))
        .when(isNumeric(c), lit(3))
        .when(boolValue(c).isNotNull, lit(4))
        .when(tsValue(c).isNotNull, lit(5))
        .when(isStringLit(c), lit(6))
        .when(timeValue(c).isNotNull, lit(7))
        .when(durMonths(c).isNotNull, lit(8))
        .otherwise(lit(9))
    val num =
      when(isNumeric(c), numDouble(c))
        .when(boolValue(c).isNotNull, boolValue(c).cast(DoubleType))
        .when(tsValue(c).isNotNull, tsValue(c).cast(DoubleType))
        .when(timeValue(c).isNotNull, timeValue(c))
        // durations: one probe is a total order that refines the partial
        // value order (reference sorts YMD by months, DTD by seconds —
        // sortable_term/builder.rs:81-103); lexical tie-breaks in `s`
        .when(durMonths(c).isNotNull, durProbe(c, "1969-09-01"))
        .otherwise(lit(0.0))
    val s =
      when(isNumeric(c), lit(""))
        .when(isStringLit(c), value(c))
        .when(isIri(c) || isBlank(c), value(c))
        .otherwise(concat_ws("\u0000", coalesce(datatypeRaw(c), lit("")), value(c)))
    struct(cls.as("c"), num.as("n"), s.as("s"))
  }

  // --------------------------------------------------------------- identity

  /** sameTerm(a,b): RDF term identity — struct equality on PlainTerm
    * (reference compares PlainTerm bytes). Spark's <=> / === compare structs
    * field-wise natively. */
  def sameTerm(a: Column, b: Column): Column = a === b

  /** SPARQL solution compatibility for join conditions: equal or unbound on
    * either side (reference: lib/functions/src/builtin/query/is_compatible.rs). */
  def isCompatible(a: Column, b: Column): Column =
    a.isNull || b.isNull || (a === b)
}
