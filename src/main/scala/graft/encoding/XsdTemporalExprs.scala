package graft.encoding

import java.time.LocalDate
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftExprBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Xsd

/**
 * xsd:time / xsd:duration lexical parsing as native Catalyst expressions.
 *
 * These COULD be spelled with `regexp_extract` column chains (and first
 * were), but each chain re-extracts per component — 7 capture groups × two
 * comparison sides × four calendar probes — and Catalyst's collapse/pushdown
 * rules inline the whole tree per reference, which blew BSBM plan
 * OPTIMIZATION time (minutes inside ColumnPruning) and pushed filters past
 * the 64 KB Janino method limit into interpreted fallback. A single custom
 * expression node keeps the tree constant-size and the parse one pass; the
 * reference parses these lexicals natively too
 * (lib/model/src/xsd/duration.rs, time.rs — via oxsdatatypes).
 *
 * All four evaluate to NULL on ill-formed lexicals / wrong datatypes, which
 * the engine treats as "not this family" (comparison branch falls through).
 */
object XsdTemporal {

  // 24:00:00(.0*)? is a valid XSD lexical meaning end-of-day = start of the
  // next day; it normalizes to 0 seconds-of-day (same rule as the dateTime
  // cast's 24:00:00 handling).
  private val timeRe = Pattern.compile(
    "([01][0-9]|2[0-3]):([0-5][0-9]):([0-5][0-9](?:\\.[0-9]+)?)(Z|[+-](?:0[0-9]|1[0-4]):[0-5][0-9])?" +
      "|(24):(00):(00(?:\\.0+)?)(Z|[+-](?:0[0-9]|1[0-4]):[0-5][0-9])?")

  // XSD duration lexical: -?PnYnMnDTnHnMn(.n)S — every component optional,
  // at least one digit present, no dangling 'T'. Y/M digits capped at 9 so
  // the month arithmetic stays in Int space; D/H/M/S allow 18 digits (their
  // math is Double seconds — i64-range second counts like PT10000000000S
  // must parse, matching the reference's oxsdatatypes range).
  private val durRe = Pattern.compile(
    "(-)?P(?:([0-9]{1,9})Y)?(?:([0-9]{1,9})M)?(?:([0-9]{1,18})D)?" +
      "(?:T(?:([0-9]{1,18})H)?(?:([0-9]{1,18})M)?(?:([0-9]{1,18}(?:\\.[0-9]+)?)S)?)?")

  /** Timeline seconds of an xsd:time: seconds-of-day minus the timezone
    * offset (naive = implicit UTC, matching the engine's xsd:dateTime rule).
    * Null unless `dt` is xsd:time and the lexical is well-formed. */
  def timeValue(value: UTF8String, dt: UTF8String): java.lang.Double = {
    if (value == null || dt == null || dt.toString != Xsd.time) return null
    val m = timeRe.matcher(value.toString)
    if (!m.matches()) return null
    val end24 = m.group(1) == null // the 24:00:00 alternation branch matched
    val tz = if (end24) m.group(8) else m.group(4)
    val tzSecs =
      if (tz == null || tz == "Z") 0
      else {
        val sign = if (tz.charAt(0) == '-') -1 else 1
        sign * (tz.substring(1, 3).toInt * 3600 + tz.substring(4, 6).toInt * 60)
      }
    val secondsOfDay =
      if (end24) 0.0 // 24:00:00 ≡ 00:00:00 (end-of-day normalizes)
      else m.group(1).toInt * 3600.0 + m.group(2).toInt * 60.0 + m.group(3).toDouble
    secondsOfDay - tzSecs
  }

  /** (months, seconds) of a duration-family literal, or null. Subtype
    * lexical restrictions: yearMonthDuration has months only;
    * dayTimeDuration has no Y and no M before T. */
  private def parseDur(value: UTF8String, dt: UTF8String): Array[Double] = {
    if (value == null || dt == null) return null
    val d = dt.toString
    if (d != Xsd.duration && d != Xsd.yearMonthDuration && d != Xsd.dayTimeDuration)
      return null
    val s = value.toString
    val m = durRe.matcher(s)
    if (!m.matches() || !s.exists(_.isDigit) || s.endsWith("T")) return null
    if (d == Xsd.yearMonthDuration && (s.contains("D") || s.contains("T"))) return null
    if (d == Xsd.dayTimeDuration &&
        (s.contains("Y") || s.takeWhile(_ != 'T').contains("M"))) return null
    val sign = if (m.group(1) != null) -1 else 1
    def g(i: Int): Long = { val v = m.group(i); if (v == null) 0L else v.toLong }
    val months = sign * (g(2) * 12 + g(3))
    // component digits are capped at 9, but 1e9 years still overflows the
    // Int month domain — treat such absurd durations as unsupported (null)
    if (months > Int.MaxValue || months < Int.MinValue) return null
    val frac = m.group(7)
    val secs = sign * (g(4) * 86400.0 + g(5) * 3600.0 + g(6) * 60.0 +
      (if (frac == null) 0.0 else frac.toDouble))
    Array(months.toDouble, secs)
  }

  def durMonths(value: UTF8String, dt: UTF8String): java.lang.Integer = {
    val p = parseDur(value, dt)
    if (p == null) null else Int.box(p(0).toInt)
  }

  def durSeconds(value: UTF8String, dt: UTF8String): java.lang.Double = {
    val p = parseDur(value, dt)
    if (p == null) null else Double.box(p(1))
  }

  /** Timeline probe: epoch seconds after adding the duration to `refEpochDay`
    * (XSD month arithmetic = calendar add with day-clamping; the reference
    * orders durations by agreement across four such probes —
    * lib/model/src/xsd/duration.rs:271-306). */
  def durProbe(value: UTF8String, dt: UTF8String, refEpochDay: Long): java.lang.Double = {
    val p = parseDur(value, dt)
    if (p == null) null
    else try Double.box(
      LocalDate.ofEpochDay(refEpochDay).plusMonths(p(0).toLong).toEpochDay * 86400.0 + p(1))
    catch { case _: java.time.DateTimeException => null } // beyond LocalDate's year range
  }
}

/** Base for the two-child (value, datatype) temporal parses: nullable result
  * even on non-null inputs, codegen = one static call. */
private[encoding] abstract class XsdTemporalExpr extends BinaryExpression {
  def fn: String                 // static method on XsdTemporal
  def boxed: String              // boxed Java result type
  def prim: String               // primitive cast for ev.value
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def eval(input: InternalRow): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val extra = this match {
      case p: XsdDurationProbe => s", ${p.refEpochDay}L"
      case _ => ""
    }
    nullSafeCodeGen(ctx, ev, (v, d) => {
      val r = ctx.freshName("r")
      s"""
         |$boxed $r = graft.encoding.XsdTemporal.$fn($v, $d$extra);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.${prim}Value(); }
       """.stripMargin
    })
  }
}

case class XsdTimeSeconds(left: Expression, right: Expression) extends XsdTemporalExpr {
  override def fn: String = "timeValue"
  override def boxed: String = "java.lang.Double"
  override def prim: String = "double"
  override def dataType: DataType = DoubleType
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input).asInstanceOf[UTF8String]
    val d = right.eval(input).asInstanceOf[UTF8String]
    XsdTemporal.timeValue(v, d)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class XsdDurationMonths(left: Expression, right: Expression) extends XsdTemporalExpr {
  override def fn: String = "durMonths"
  override def boxed: String = "java.lang.Integer"
  override def prim: String = "int"
  override def dataType: DataType = IntegerType
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input).asInstanceOf[UTF8String]
    val d = right.eval(input).asInstanceOf[UTF8String]
    XsdTemporal.durMonths(v, d)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class XsdDurationSeconds(left: Expression, right: Expression) extends XsdTemporalExpr {
  override def fn: String = "durSeconds"
  override def boxed: String = "java.lang.Double"
  override def prim: String = "double"
  override def dataType: DataType = DoubleType
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input).asInstanceOf[UTF8String]
    val d = right.eval(input).asInstanceOf[UTF8String]
    XsdTemporal.durSeconds(v, d)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class XsdDurationProbe(left: Expression, right: Expression, refEpochDay: Long)
    extends XsdTemporalExpr {
  override def fn: String = "durProbe"
  override def boxed: String = "java.lang.Double"
  override def prim: String = "double"
  override def dataType: DataType = DoubleType
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input).asInstanceOf[UTF8String]
    val d = right.eval(input).asInstanceOf[UTF8String]
    XsdTemporal.durProbe(v, d, refEpochDay)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level wrappers (classic API). */
object XsdTemporalCols {
  private def e(c: Column): Expression = GraftExprBridge.expression(c)
  def timeSeconds(value: Column, dt: Column): Column =
    GraftExprBridge.column(XsdTimeSeconds(e(value), e(dt)))
  def durationMonths(value: Column, dt: Column): Column =
    GraftExprBridge.column(XsdDurationMonths(e(value), e(dt)))
  def durationSeconds(value: Column, dt: Column): Column =
    GraftExprBridge.column(XsdDurationSeconds(e(value), e(dt)))
  def durationProbe(value: Column, dt: Column, refDate: String): Column =
    GraftExprBridge.column(XsdDurationProbe(e(value), e(dt),
      LocalDate.parse(refDate).toEpochDay))
}
