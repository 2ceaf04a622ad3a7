package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.encoding.TermCols
import graft.encoding.TermCols._
import graft.model._
import graft.sparql.Algebra._

/**
 * Compiles SPARQL expressions to Catalyst column expressions over PlainTerm
 * structs.
 *
 * Semantics follow the reference's function library
 * (/root/reference/lib/functions/src/scalar/ — one file per builtin, registry
 * lib/extensions/src/functions/builtin.rs:6-99): every function is total,
 * errors are *values*. The reference encodes errors as the null union variant
 * of its TypedValue encoding (lib/functions/src/scalar/dispatch/unary.rs:11-53);
 * we adopt the same convention — error ≡ unbound ≡ NULL struct — so all
 * expressions stay inside whole-stage codegen (no UDFs, no exceptions).
 *
 * EExists never reaches this compiler: the rewriter replaces it with a marker
 * variable (see [[Rewriter]]).
 */
object ExprCompiler {

  /**
   * Resolve a variable name to its column; unknown variables are unbound.
   * `kind` optionally reports a statically-known kind of the variable's
   * BOUND values (1 = integer, 2 = decimal, 3 = double, 4 = dateTime with
   * the fixed `yyyy-MM-ddTHH:mm:ss` lexical shape, 5 = date `yyyy-MM-dd`) —
   * known e.g. when the var is bound from a relational mapping column of a
   * fixed native type. A static kind lets the arithmetic/aggregation/
   * comparison compilers emit pre-dispatched code: Catalyst constant-folds
   * the datatype CASE trees away (measured ~6× on numeric BIND+SUM hot
   * paths); temporal kinds turn YEAR()-style accessors into substrings of
   * the fixed-shape lexical and comparisons into plain string compares.
   *
   * INVARIANT: a kind recorded in a plan's kinds map vouches that every
   * bound value is CANONICALLY rendered (mapping columns and computed
   * arithmetic render canonically; BIND of a raw literal only claims a kind
   * when its lexical form is canonical — see [[bindKind]]). This is what
   * allows group keys and MIN/MAX buffers to collapse to narrow native
   * values and reconstruct the term afterwards.
   */
  trait Env extends (String => Column) {
    def kind(name: String): Option[Int] = None
    /** Materialise a subexpression as a named column and return a reference
      * to it, when the compilation site can (DataFrame projection contexts);
      * identity elsewhere (join conditions). The dynamic dispatch ladders
      * (cmp, arith fallback, n-ary calls) reference each operand ~15×, so
      * inlining a non-trivial operand multiplies its tree size — binding
      * caps growth AND evaluates the operand once per row. All compiled
      * expressions are total (errors → NULL), so eager evaluation of a
      * bound operand is safe. */
    def bind(c: Column): Column = c
    /** Per-solution nonce for labeled BNODE scoping (spec §17.4.2.9): the
      * rewriter materialises one uuid column per BIND-chain / select-
      * expression run so BNODE("l") is stable within a solution and fresh
      * across solutions. Absent in contexts without a solution relation
      * (join conditions, aggregates) — there the label hashes alone. */
    def sol: Option[Column] = None
  }

  def envOf(inScope: Set[String], kinds: Map[String, Int] = Map.empty,
            binder: Column => Column = identity,
            solCol: Option[Column] = None): Env =
    new Env {
      def apply(name: String): Column = if (inScope(name)) col(name) else nullTerm
      override def kind(name: String): Option[Int] = kinds.get(name)
      override def bind(c: Column): Column = binder(c)
      override def sol: Option[Column] = solCol
    }

  /** Does the expression call the labeled BNODE form anywhere? */
  def usesLabeledBnode(e: Expr): Boolean =
    exprContains(e) {
      case ECall("BNODE", args) => args.nonEmpty
      case _ => false
    }

  /** Bind the compiled form of `e` unless it is trivially small. */
  private def bindIf(e: Expr, c: Column, env: Env): Column = e match {
    case EVar(_) | ETerm(_) | EBound(_) => c
    case _ => env.bind(c)
  }

  // ------------------------------------------------------------ entry points

  /** Compile to a PlainTerm struct column. */
  def term(e: Expr, env: Env): Column = e match {
    case ETerm(t) => termLit(t)
    case EVar(v) => env(v.name)
    case EOr(l, r) => fromBoolean(ebv(l, env) || ebv(r, env))
    case EAnd(l, r) => fromBoolean(ebv(l, env) && ebv(r, env))
    case ENot(x) => fromBoolean(!ebv(x, env))
    case ECmp(op, l, r) =>
      fromBoolean(cmpStatic(op, l, r, env).getOrElse(
        cmp(op, bindIf(l, term(l, env), env), bindIf(r, term(r, env), env),
          exotic = maybeTimeOrDur(l, env) && maybeTimeOrDur(r, env))))
    case EIn(x, list, neg) =>
      val c = bindIf(x, term(x, env), env)
      val xExotic = maybeTimeOrDur(x, env)
      val anyEq = list.map(i => cmp("=", c, term(i, env),
          exotic = xExotic && maybeTimeOrDur(i, env))).reduceOption(_ || _)
        .getOrElse(when(c.isNull, lit(null).cast(BooleanType)).otherwise(lit(false)))
      fromBoolean(if (neg) !anyEq else anyEq)
    case e @ EArith(op, l, r) =>
      // numeric-domain fast path: the whole arithmetic subtree computes on
      // (double, decimal, kind) columns and the term struct — including its
      // lexical form — is rendered ONCE at the root. Without this, nested
      // arithmetic re-renders a full term struct (with double→string lexical)
      // per intermediate and the type-dispatch CASE trees blow up
      // combinatorially (measured 10× on BIND(?p * (1 - ?d)) aggregations).
      numericView(e, env) match {
        case Some((d, dec, k)) =>
          // bind the view components of a NESTED subtree before the render
          // ladder references them; single-level views stay inline
          val trivial = Seq(l, r).forall { case EVar(_) | ETerm(_) => true; case _ => false }
          if (trivial) renderNumeric(d, dec, k)
          else renderNumeric(env.bind(d), env.bind(dec), env.bind(k))
        case None =>
          arith(op, bindIf(l, term(l, env), env), bindIf(r, term(r, env), env))
      }
    case e @ ENeg(x) =>
      numericView(e, env) match {
        case Some((d, dec, k)) => renderNumeric(d, dec, k)
        case None => negate(bindIf(x, term(x, env), env))
      }
    case EBound(v) => fromBoolean(env(v.name).isNotNull)
    case EIf(c, t, f) =>
      val cc = bindIf(c, ebv(c, env), env)
      when(cc, term(t, env)).when(!cc, term(f, env)).otherwise(nullTerm)
    case ECoalesce(args) => coalesce(args.map(term(_, env)): _*)
    case e @ ECall(name, args) =>
      // date-part accessors over statically-temporal args render via the
      // numeric fast path (substring, no regexp)
      numericView(e, env) match {
        case Some((d, dec, k)) => renderNumeric(d, dec, k)
        case None => call(name, args.map(a => bindIf(a, term(a, env), env)), env)
      }
    case EExists(_, _) =>
      throw new IllegalStateException("EXISTS must be rewritten before expression compilation")
    case EAgg(_) =>
      throw new IllegalStateException("aggregate must be hoisted before expression compilation")
  }

  /** Compile to a native boolean (EBV'd) — for FILTER / IF / join conditions.
    * NULL = error (row is dropped by FILTER, matching SPARQL). */
  def ebv(e: Expr, env: Env): Column = e match {
    // short-circuit common boolean shapes to avoid term round-trips
    // (the reference's EBV(BOOLEAN_AS_TERM(x)) → x simplifier,
    //  lib/logical/src/expr/expression_simplifier.rs:259-305)
    case EOr(l, r) => ebv(l, env) || ebv(r, env)
    case EAnd(l, r) => ebv(l, env) && ebv(r, env)
    case ENot(x) => !ebv(x, env)
    case ECmp(op, l, r) =>
      cmpStatic(op, l, r, env).getOrElse(
        cmp(op, bindIf(l, term(l, env), env), bindIf(r, term(r, env), env),
          exotic = maybeTimeOrDur(l, env) && maybeTimeOrDur(r, env)))
    case EBound(v) => env(v.name).isNotNull
    case EIn(x, list, neg) =>
      val c = bindIf(x, term(x, env), env)
      val xExotic = maybeTimeOrDur(x, env)
      val anyEq = list.map(i => cmp("=", c, term(i, env),
          exotic = xExotic && maybeTimeOrDur(i, env))).reduceOption(_ || _)
        .getOrElse(when(c.isNull, lit(null).cast(BooleanType)).otherwise(lit(false)))
      if (neg) !anyEq else anyEq
    case other => ebvOfTerm(term(other, env))
  }

  /** SPARQL 17.2.2 Effective Boolean Value of a term
    * (reference: lib/functions/src/builtin/native/effective_boolean_value.rs:20-60). */
  def ebvOfTerm(c: Column): Column =
    when(boolValue(c).isNotNull, boolValue(c))
      .when(isNumeric(c), !isnan(numDouble(c)) && numDouble(c) =!= 0.0)
      .when(isStringLit(c), length(value(c)) > 0)
      .otherwise(lit(null).cast(BooleanType))

  /** A ground RDF term as a literal column. */
  def termLit(t: RdfTerm): Column = t match {
    case Iri(v) => TermCols.iri(lit(v))
    case BNode(v) => TermCols.bnode(lit(v))
    case Lit(v, dt, lang) =>
      val dtc = if (lang.isEmpty && (dt == null || dt == Xsd.string)) lit(null).cast(StringType)
                else lit(if (lang.isDefined) Rdf.langString else dt)
      TermCols.literal(lit(v), dtc, lang.map(l => lit(l)).getOrElse(lit(null).cast(StringType)))
  }

  // ------------------------------------------------------------- comparisons

  /** SPARQL operator mapping (reference lib/functions/src/scalar/comparison/):
    * numeric cross-type by value, strings by codepoint, booleans, dateTimes;
    * '=' additionally term identity for IRIs/bnodes; incomparable → error. */
  def cmp(op: String, l: Column, r: Column, exotic: Boolean = true): Column = {
    val bothNum = isNumeric(l) && isNumeric(r)
    val exact = !isDoubleTyped(l) && !isDoubleTyped(r) // ints/decimals compare exactly
    val numCmp = binOp(op,
      when(exact, numDecimal(l)).otherwise(numDouble(l).cast(DecimalType(38, 15))),
      when(exact, numDecimal(r)).otherwise(numDouble(r).cast(DecimalType(38, 15))))
    val numCmpD = binOp(op, numDouble(l), numDouble(r))
    val strCmp = binOp(op, value(l), value(r))
    val boolCmp = binOp(op, boolValue(l), boolValue(r))
    val tsCmp = binOp(op, tsValue(l), tsValue(r))
    val sameKindStr = isStringLit(l) && isStringLit(r) && (langTag(l) <=> langTag(r))
    // temporal comparison is WITHIN one datatype only: date < dateTime is a
    // type error in XPath and in the reference (typed_value.rs
    // partial_cmp_literals matches DateTimeLiteral/DateLiteral separately)
    val sameTemporal = tsValue(l).isNotNull && tsValue(r).isNotNull &&
      (datatypeRaw(l) === datatypeRaw(r))
    val bothTime = timeValue(l).isNotNull && timeValue(r).isNotNull
    val timeCmp = binOp(op, timeValue(l), timeValue(r))
    val bothDur = durMonths(l).isNotNull && durMonths(r).isNotNull
    // duration order is PARTIAL: defined only when adding both durations to
    // four reference dates (spanning 28/30/31-day months) agrees — the
    // reference's algorithm verbatim (lib/model/src/xsd/duration.rs:271-306);
    // disagreement (e.g. P1M vs P30D) is a type error, not false
    def durCmp(o: String): Column = {
      val probes = Seq("1969-09-01", "1697-02-01", "1903-03-01", "1903-07-01")
        .map(d => (durProbe(l, d), durProbe(r, d)))
      val allLt = probes.map { case (a, b) => a < b }.reduce(_ && _)
      val allGt = probes.map { case (a, b) => a > b }.reduce(_ && _)
      val allEq = probes.map { case (a, b) => a === b }.reduce(_ && _)
      o match {
        case "<"  => when(allLt, true).when(allGt || allEq, false)
        case ">"  => when(allGt, true).when(allLt || allEq, false)
        case "<=" => when(allLt || allEq, true).when(allGt, false)
        case ">=" => when(allGt || allEq, true).when(allLt, false)
        case _    => when(allEq, true).when(allLt || allGt, false) // "="
      }
    }
    // The time/duration branches fire only when BOTH operands are of that
    // family; callers that can statically rule one side out (a numeric or
    // dateTime/date static kind, a literal of any other datatype, a
    // boolean-producing node) pass exotic = false and skip them — the
    // branches' conditions would be constant-false, but their expression
    // trees (4 calendar probes × 2 sides, each over regexp extracts) are
    // large enough to push big BSBM filters past the 64 KB codegen limit
    // into interpreted fallback (measured: BI-Q8 1.6 s → minutes).
    val base0 =
      when(bothNum, when(isDoubleTyped(l) || isDoubleTyped(r), numCmpD).otherwise(numCmp))
        .when(sameKindStr, strCmp)
        .when(boolValue(l).isNotNull && boolValue(r).isNotNull, boolCmp)
        .when(sameTemporal, tsCmp)
    val base =
      if (!exotic) base0
      else base0.when(bothTime, timeCmp)
        .when(bothDur, if (op == "=") durCmp("=") else durCmp(op))
    op match {
      case "=" =>
        base.when(termType(l).isin(0, 1) && termType(l) === termType(r), value(l) === value(r))
          // identical unknown-type literals are equal; different unknown → error
          .when(l === r, lit(true))
          .otherwise(lit(null).cast(BooleanType))
      case "!=" =>
        val eq0 = when(bothNum, when(isDoubleTyped(l) || isDoubleTyped(r),
            binOp("=", numDouble(l), numDouble(r))).otherwise(binOp("=", numDecimal(l), numDecimal(r))))
          .when(sameKindStr, binOp("=", value(l), value(r)))
          .when(boolValue(l).isNotNull && boolValue(r).isNotNull, binOp("=", boolValue(l), boolValue(r)))
          .when(sameTemporal, binOp("=", tsValue(l), tsValue(r)))
        val eq1 =
          if (!exotic) eq0
          else eq0.when(bothTime, binOp("=", timeValue(l), timeValue(r)))
            .when(bothDur, durCmp("="))
        !(eq1
          .when(termType(l).isin(0, 1) && termType(l) === termType(r), value(l) === value(r))
          .when(l === r, lit(true))
          .otherwise(lit(null).cast(BooleanType)))
      case _ => base.otherwise(lit(null).cast(BooleanType))
    }
  }

  /**
   * Statically-dispatched numeric comparison: when BOTH operands are
   * statically numeric, SPARQL operator mapping is plain numeric comparison
   * (value semantics; unbound/error operands yield NULL). The pay-off is
   * plan size: the dynamic dispatch tree references each operand ~15×, and
   * Catalyst's filter pushdown inlines the operand's defining expression per
   * reference (measured 15 copies of a YEAR() extraction in one predicate).
   */
  /** Can `e` possibly evaluate to an xsd:time or duration-family literal?
    * False for boolean-producing nodes, literals of any other datatype, and
    * expressions with a known numeric/temporal static kind — in which case
    * [[cmp]] may drop its time/duration branches (they compare only
    * same-family operands, so one ruled-out side rules the branch out). */
  private def maybeTimeOrDur(e: Expr, env: Env): Boolean = e match {
    case ETerm(graft.model.Lit(_, dt, lang)) =>
      lang.isEmpty && (dt == graft.model.Xsd.time || dt == graft.model.Xsd.duration ||
        dt == graft.model.Xsd.yearMonthDuration || dt == graft.model.Xsd.dayTimeDuration)
    case ETerm(_) => false
    case EOr(_, _) | EAnd(_, _) | ENot(_) | EBound(_) | ECmp(_, _, _) |
         EIn(_, _, _) | EArith(_, _, _) | ENeg(_) => false
    case _ => staticKind(e, env).isEmpty
  }

  private def cmpStatic(op: String, l: Expr, r: Expr, env: Env): Option[Column] =
    (staticKind(l, env), staticKind(r, env)) match {
      case (Some(lk), Some(rk)) if lk <= 3 && rk <= 3 =>
        for ((ld, le, _) <- numericView(l, env); (rd, re, _) <- numericView(r, env))
          yield if (lk == 3 || rk == 3) binOp(op, ld, rd) else binOp(op, le, re)
      case (Some(lk), Some(rk)) if lk == rk => // both dateTime or both date
        // fixed equal-length lexical shape ⇒ string order ≡ temporal order
        for ((lv, _) <- temporalLex(l, env); (rv, _) <- temporalLex(r, env))
          yield binOp(op, lv, rv)
      case _ =>
        // DYNAMIC numeric-only dispatch: an arithmetic operand is numeric
        // or error by construction, and the ORDERING operators have no
        // non-numeric fallback in the operator mapping (unlike = / !=,
        // which fall back to RDFterm-equality on IRIs/bnodes), so the whole
        // comparison compiles in the (double, decimal, kind) domain — no
        // term structs and no canonical lexical rendering. Plan-size
        // matters more than row cost here: filter pushdown inlines the
        // operand's defining expression per ladder reference, and BSBM
        // explore-q5's band filter compiled to two ~950 KB join conditions
        // (~10 s of one-time Janino compile) via the generic ladder.
        def intrinsicallyNumeric(e: Expr): Boolean = e match {
          case EArith(_, _, _) | ENeg(_) => true
          case _ => false
        }
        if ((op == "<" || op == "<=" || op == ">" || op == ">=") &&
            (intrinsicallyNumeric(l) || intrinsicallyNumeric(r)))
          for ((ld, le, lk) <- numericView(l, env); (rd, re, rk) <- numericView(r, env))
            yield when(lk =!= 0 && rk =!= 0,
              when(lk >= 3 || rk >= 3, binOp(op, ld, rd))
                .otherwise(binOp(op, le, re)))
        else None
    }

  private def binOp(op: String, l: Column, r: Column): Column = op match {
    case "=" => l === r
    case "!=" => l =!= r
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
  }

  // -------------------------------------------------------------- arithmetic

  /**
   * Numeric-domain view of an arithmetic subtree — the TypedValue analogue
   * (reference lib/encoding/src/typed_value): `(double, decimal, kind)`
   * columns with kind 0 = error/non-numeric, 1 = integer, 2 = decimal,
   * 3 = float, 4 = double. NB this RUNTIME lattice is ordered so that
   * `greatest` is exactly the XPath promotion join; it differs from the
   * plan-time [[staticKind]] domain, where 3 is the whole double FAMILY
   * (float or double) and 4/5 are temporal.
   * Only the root renders a PlainTerm struct, so intermediates
   * never build structs or lexical strings, and only the branch matching the
   * runtime kind is evaluated per row. None ⇒ the subtree contains
   * non-arithmetic nodes; caller falls back to term-struct compilation.
   */
  private def numericView(e: Expr, env: Env): Option[(Column, Column, Column)] = e match {
    case EVar(v) =>
      val c = env(v.name)
      env.kind(v.name) match {
        case Some(k) if k <= 3 || k == 6 =>
          // static kind: a NULL value (unbound) still renders as error via
          // the null num/decimal, so the literal kind is safe. The
          // isNumeric datatype guard inside numDecimal is statically true
          // here — parse the lexical unguarded so no INSET datatype test
          // survives into the plan
          val dec = if (k >= 3) lit(null).cast(DecimalType(36, 16))
                    else value(c).try_cast(DecimalType(36, 16))
          // static kind 3 = double FAMILY: split into runtime float/double
          // by the datatype field (one cheap string test, no INSET);
          // recorded kind 6 is statically float
          val rk = if (k == 6) lit(3)
                   else if (k == 3) when(datatypeRaw(c) === graft.model.Xsd.float, lit(3)).otherwise(lit(4))
                   else lit(k)
          Some((numDouble(c), dec, rk))
        case Some(_) =>
          // statically temporal: never numeric — arithmetic on it is a
          // type error regardless of the runtime value
          Some((lit(null).cast(DoubleType), lit(null).cast(DecimalType(36, 16)), lit(0)))
        case None =>
          val kind = when(!coalesce(isNumeric(c), lit(false)), lit(0))
            .when(isStrictDoubleTyped(c), lit(4))
            .when(isFloatTyped(c), lit(3))
            .when(isDecimalTyped(c), lit(2))
            .otherwise(lit(1))
          Some((numDouble(c), numDecimal(c), kind))
      }
    case ETerm(graft.model.Lit(v, dt, None)) =>
      val kind =
        if (dt == graft.model.Xsd.double) 4
        else if (dt == graft.model.Xsd.float) 3
        else if (dt == graft.model.Xsd.decimal) 2
        else if (graft.model.Xsd.numericTypes.contains(dt)) 1
        else 0
      val d: java.lang.Double = v.trim match {
        case _ if kind == 0 => null
        case "INF" | "+INF" => Double.PositiveInfinity
        case "-INF" => Double.NegativeInfinity
        case "NaN" => Double.NaN
        case s => scala.util.Try(java.lang.Double.valueOf(s)).getOrElse(null)
      }
      val dec = scala.util.Try(BigDecimal(v.trim)).toOption.orNull
      // unparsable lexical form in arithmetic = type error (kind 0)
      val k = if (kind == 0 || (d == null && dec == null)) 0 else kind
      Some((lit(d).cast(DoubleType), lit(dec).cast(DecimalType(36, 16)), lit(k)))
    case ETerm(_) => // non-numeric term in arithmetic → error
      Some((lit(null).cast(DoubleType), lit(null).cast(DecimalType(36, 16)), lit(0)))
    case EArith(op, l, r) =>
      for ((ld, le, lk) <- numericView(l, env); (rd, re, rk) <- numericView(r, env)) yield {
        val d = op match {
          case "+" => ld + rd
          case "-" => ld - rd
          case "*" => ld * rd
          case "/" => ieeeDiv(ld, rd)
        }
        val dec = op match {
          case "+" => le + re
          case "-" => le - re
          case "*" => (le * re).cast(DecimalType(36, 16))
          // try_divide, NOT a when-guard around `/`: with literal operands
          // the division folds independently of the guard and an ANSI ÷0
          // throws at plan time; try_divide folds to null = evaluation error
          case "/" => try_divide(le, re).cast(DecimalType(36, 16))
        }
        val minKind = if (op == "/") 2 else 1 // int ÷ int is xsd:decimal
        val kind = when(lk === 0 || rk === 0, lit(0))
          .otherwise(greatest(lk, rk, lit(minKind)))
        (d, dec, kind)
      }
    case ENeg(x) =>
      numericView(x, env).map { case (d, dec, k) => (-d, -dec, k) }
    case ECall(name @ ("YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" | "SECONDS"),
               Seq(a)) =>
      // Deliberate divergence, pinned by slice test dt_accessors_on_date:
      // YEAR/MONTH/DAY also accept xsd:date (SPARQL 1.2 extends the
      // operator mapping to date; the reference's accessors take only
      // DateTimeLiteral — lib/functions/src/scalar/dates_and_times/year.rs:49
      // — which would error on the date-typed columns every RDB→RDF mapping
      // produces). Time-of-day accessors on xsd:date stay type errors.
      // statically-temporal argument: the lexical shape is fixed
      // (yyyy-MM-ddTHH:mm:ss / yyyy-MM-dd, Spark timestamps are years
      // 0001–9999 so the year field is always exactly 4 digits), so the
      // date-part accessors are plain substrings — no regexp, and the
      // copies that filter pushdown inlines stay cheap
      val fast = temporalLex(a, env).flatMap { case (v, tk) =>
        val pos = name match {
          case "YEAR" => Some(1 -> 4)
          case "MONTH" => Some(6 -> 2)
          case "DAY" => Some(9 -> 2)
          case "HOURS" if tk == 4 => Some(12 -> 2)
          case "MINUTES" if tk == 4 => Some(15 -> 2)
          case "SECONDS" if tk == 4 => Some(18 -> 2)
          case _ => None // time-of-day accessor on xsd:date = type error
        }
        pos.map { case (p, len) =>
          val l = substring(v, p, len).cast(LongType)
          val kind = if (name == "SECONDS") 2 else 1
          (l.cast(DoubleType), l.cast(DecimalType(36, 16)), lit(kind))
        }
      }
      // dynamic argument: the regex extraction, in the NUMERIC domain —
      // crucial for nested arithmetic over accessors (e.g.
      // 10*FLOOR(MINUTES(?t)/10)): the generic term-struct ladder
      // references each operand ~15×, so nesting grows the expression tree
      // multiplicatively — enough to stall the ANALYZER for minutes on a
      // 3-deep nest (measured on the windfarm grouped queries)
      fast.orElse {
        val c = term(a, env)
        val re = name match {
          case "YEAR" => "^(-?\\d{4,})"
          case "MONTH" => "^-?\\d{4,}-(\\d{2})"
          case "DAY" => "^-?\\d{4,}-\\d{2}-(\\d{2})"
          case "HOURS" => "T(\\d{2})"
          case "MINUTES" => "T\\d{2}:(\\d{2})"
          case "SECONDS" => "T\\d{2}:\\d{2}:(\\d{2}(?:\\.\\d+)?)"
        }
        val s = when(isDateTimeLit(c), regexp_extract(value(c), re, 1))
        val kind = if (name == "SECONDS") 2 else 1
        val dec = s.try_cast(DecimalType(36, 16))
        Some((s.try_cast(DoubleType),
          dec,
          when(dec.isNotNull, lit(kind)).otherwise(lit(0))))
      }
    case ECall(n, Seq(a)) if n == Xsd.double || n == Xsd.float || n == Xsd.decimal ||
                             n == Xsd.integer || n == Xsd.int || n == Xsd.long =>
      // Numeric-domain closure over XSD numeric constructor casts (BSBM
      // BI-Q8's xsd:float(?count) / ?count BIND and its
      // float(string(?price)) < ?avg filter): compile the cast ONCE with its
      // exact generic semantics (xsdCast via term, bound as a column), then
      // read the pre-decoded num field. Without this the surrounding
      // arithmetic/comparison falls back to the generic term-struct ladder,
      // which references each operand ~15× — bi-q8's ratio BIND alone
      // rendered a 192 KB Project expression and ~13 s of Catalyst optimize
      // per fresh plan.
      // xsdCast directly (NOT term(e) — term's ECall branch would recurse
      // straight back into this numericView case)
      val t = env.bind(xsdCast(n, bindIf(a, term(a, env), env), env))
      val k = if (n == Xsd.double) 4 else if (n == Xsd.float) 3
              else if (n == Xsd.decimal) 2 else 1
      val dec = if (k >= 3) lit(null).cast(DecimalType(36, 16))
                else value(t).try_cast(DecimalType(36, 16))
      // cast failure and unbound input both yield the null term → kind 0
      Some((numDouble(t), dec, when(t.isNull, lit(0)).otherwise(lit(k))))
    case ECall(name @ ("FLOOR" | "CEIL" | "ABS" | "ROUND"), Seq(a)) =>
      // numeric-domain closure: no term structs materialise between nested
      // numeric calls, so tree growth is additive, not multiplicative
      numericView(a, env).map { case (d, dec, k) =>
        val (fd, fdec) = name match {
          case "FLOOR" => (floor(d).cast(DoubleType), floor(dec).cast(DecimalType(36, 16)))
          case "CEIL" => (ceil(d).cast(DoubleType), ceil(dec).cast(DecimalType(36, 16)))
          case "ABS" => (abs(d), abs(dec))
          // XPath round: half toward +infinity (matches the generic path)
          case "ROUND" => (floor(d + lit(0.5)).cast(DoubleType),
            floor(dec + lit(BigDecimal(0.5))).cast(DecimalType(36, 16)))
        }
        (fd, fdec, k)
      }
    case _ => None
  }

  /**
   * Fixed-shape temporal lexical view: the lexical-form column plus the
   * temporal kind (4 = dateTime `yyyy-MM-ddTHH:mm:ss`, 5 = date
   * `yyyy-MM-dd`) when the expression is statically known to carry it —
   * a var whose kind the mapping vouches for, or a literal whose lexical
   * form matches the shape exactly. Fixed shape ⇒ equal lengths ⇒
   * lexicographic string order ≡ temporal order.
   */
  private val DateTimeShape = "\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}".r
  private val DateShape = "\\d{4}-\\d{2}-\\d{2}".r
  private def temporalLex(e: Expr, env: Env): Option[(Column, Int)] = e match {
    case EVar(v) => env.kind(v.name) match {
      case Some(k) if k == 4 || k == 5 => Some((value(env(v.name)), k))
      case _ => None
    }
    case ETerm(graft.model.Lit(v, dt, None)) =>
      if (dt == graft.model.Xsd.dateTime && DateTimeShape.matches(v)) Some((lit(v), 4))
      else if (dt == graft.model.Xsd.date && DateShape.matches(v)) Some((lit(v), 5))
      else None
    case _ => None
  }

  /** Render a numeric-domain value to a PlainTerm struct (one struct build +
    * one lexical render per row, only for the branch actually taken). */
  private def renderNumeric(d: Column, dec: Column, kind: Column): Column =
    when(kind === 0, nullTerm)
      .when(kind === 4, fromDouble(d))
      .when(kind === 3, fromFloat(d))
      .when(kind === 2, fromDecimal(dec))
      // try_cast: integer overflow beyond i64 is an evaluation error
      // (fromLong(null) = nullTerm), matching the reference's checked ops —
      // an ANSI cast would THROW and kill the query instead
      .otherwise(fromLong(dec.try_cast(LongType)))

  /** Statically-known numeric kind of an expression's bound result, if
    * derivable at plan time (promotion over static operand kinds). Lets the
    * rewriter propagate kinds through BIND into downstream aggregation. */
  def staticKind(e: Expr, env: Env): Option[Int] = e match {
    // recorded kind 6 (canonical xsd:float, see [[bindKind]]) is kind 3 —
    // the double FAMILY — for every value-domain consumer (comparison,
    // arithmetic, numeric view); only the record/rebuild machinery
    // distinguishes them
    case EVar(v) => env.kind(v.name).map(k => if (k == 6) 3 else k)
    case ETerm(graft.model.Lit(v, dt, None)) =>
      if (dt == graft.model.Xsd.double || dt == graft.model.Xsd.float) Some(3)
      else if (dt == graft.model.Xsd.decimal) Some(2)
      else if (graft.model.Xsd.numericTypes.contains(dt)) Some(1)
      else if (dt == graft.model.Xsd.dateTime && DateTimeShape.matches(v)) Some(4)
      else if (dt == graft.model.Xsd.date && DateShape.matches(v)) Some(5)
      else None
    case EArith(op, l, r) =>
      for (lk <- staticKind(l, env); rk <- staticKind(r, env))
        yield math.max(math.max(lk, rk), if (op == "/") 2 else 1)
    case ENeg(x) => staticKind(x, env)
    case ECall(name, args) => name match {
      // accessors with fixed result types (error → unbound, kind still holds
      // for bound results)
      case "YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" | "STRLEN" => Some(1)
      case "SECONDS" => Some(2)
      case "ABS" | "CEIL" | "FLOOR" | "ROUND" => staticKind(args.head, env)
      // XSD numeric constructor casts: a BOUND result always carries the
      // target datatype (invalid input → error → unbound)
      case n if n == graft.model.Xsd.double || n == graft.model.Xsd.float => Some(3)
      case n if n == graft.model.Xsd.decimal => Some(2)
      case n if n == graft.model.Xsd.integer || n == graft.model.Xsd.int ||
                n == graft.model.Xsd.long => Some(1)
      case _ => None
    }
    case _ => None
  }

  /**
   * Kind to RECORD in a plan's kinds map for a BIND/projection of `e`.
   * Same as [[staticKind]] except a bare literal only claims a kind when
   * its lexical form is canonical: the kinds-map invariant (see [[Env]])
   * lets group keys and MIN/MAX buffers collapse to narrow native values
   * and reconstruct the term afterwards, which requires the lexical to be
   * recomputable from the value. Computed subtrees (arithmetic, accessors)
   * render canonically regardless of their operands' lexical forms, and
   * temporal static kinds are shape-checked at the claim site.
   */
  def bindKind(e: Expr, env: Env): Option[Int] = e match {
    // a variable's RECORDED kind passes through raw: kind 6 (canonical
    // xsd:float — e.g. a float-family SUM/AVG result) must not collapse to
    // the family kind 3 here, or the narrow-key rebuild would retype the
    // value as xsd:double
    case EVar(v) => env.kind(v.name)
    case ETerm(graft.model.Lit(v, dt, None)) =>
      staticKind(e, env).filter {
        // the range checks keep the narrow representations (LongType /
        // Decimal(36,16)) lossless — out-of-range literals simply claim no
        // kind and stay on the generic path
        case 1 => scala.util.Try(BigInt(v).toString == v && BigInt(v).isValidLong)
          .getOrElse(false)
        case 2 => scala.util.Try {
          val bd = new java.math.BigDecimal(v)
          bd.stripTrailingZeros.toPlainString == v && bd.scale <= 16 &&
            bd.precision - bd.scale <= 20
        }.getOrElse(false)
        case 3 => dt == graft.model.Xsd.double && scala.util.Try {
          // xsd:float stays on the generic path: the narrow-key collapse
          // reconstructs kind-3 values as xsd:double, which would silently
          // retype a float group key / MIN-MAX result
          val d = v.toDouble
          val canon = if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
                      else d.toString
          canon == v
        }.getOrElse(false)
        case _ => true // temporal claims are shape-checked in staticKind
      }
    case _ =>
      staticKind(e, env).filterNot { k =>
        // a RECORDED kind 3 lets group keys / MIN-MAX buffers collapse to a
        // double and REBUILD as xsd:double — which would silently retype a
        // result that is actually xsd:float. staticKind's domain treats 3
        // as the whole double family, so refuse to record it whenever a
        // float cast anywhere in the tree could make the value a float.
        k == 3 && containsFloatCast(e, env)
      }
  }

  /** A float CAST — or a variable whose recorded kind is 6 (canonical
    * xsd:float, e.g. a float-family aggregate result) — anywhere in the
    * tree means a family-kind-3 value may actually be xsd:float. */
  private def containsFloatCast(e: Expr, env: Env): Boolean = e match {
    case EVar(v) => env.kind(v.name).contains(6)
    case ECall(n, _) if n == graft.model.Xsd.float => true
    case ECall(_, args) => args.exists(containsFloatCast(_, env))
    case EArith(_, l, r) => containsFloatCast(l, env) || containsFloatCast(r, env)
    case ENeg(x) => containsFloatCast(x, env)
    case EIf(c, t, f) =>
      containsFloatCast(c, env) || containsFloatCast(t, env) || containsFloatCast(f, env)
    case ECoalesce(args) => args.exists(containsFloatCast(_, env))
    case _ => false
  }

  /**
   * Narrow ORDER BY sort key when the expression's kind is static: all
   * bound values are then literals of ONE comparable family, so the generic
   * sortable struct (class tag, double, string — a per-row CASE ladder over
   * the datatype) collapses to a single native column. Unbound still sorts
   * as NULL — the caller's nulls_first/last handles SPARQL's
   * unbound-sorts-lowest.
   */
  def sortKeyStatic(e: Expr, env: Env): Option[Column] =
    staticKind(e, env).flatMap { k =>
      if (k <= 3) numericView(e, env).map { case (d, dec, _) => if (k == 3) d else dec }
      else temporalLex(e, env).map(_._1)
    }

  /** Numeric promotion ladder Integer → Decimal → Float → Double; `/` of
    * integers is decimal (reference lib/functions/src/scalar/numeric/{add,div,…}.rs,
    * ladder lib/model/src/xsd/numeric.rs). Non-numeric operand → error. */
  /** IEEE/XPath double division: ÷0 yields ±INF (or NaN for 0/0). Spark's
    * ANSI Divide THROWS on a zero divisor even for doubles, and constant
    * folding evaluates a literal division independently of any enclosing
    * guard — so divide by NULLIF-style `when(rd ≠ 0, rd)` (a null divisor
    * never throws and folds to null) and rebuild the IEEE specials,
    * honouring a negative-zero divisor's sign. */
  private def ieeeDiv(ld: Column, rd: Column): Column = {
    val q = ld / when(rd =!= 0.0d, rd)
    val zsign = when(rd.cast(StringType).startsWith("-"), lit(-1.0d)).otherwise(lit(1.0d))
    when(ld.isNull || rd.isNull, lit(null).cast(DoubleType))
      .when(rd =!= 0.0d, q)
      .when(isnan(ld) || ld === 0.0d, lit(Double.NaN))
      .otherwise(signum(ld) * zsign * lit(Double.PositiveInfinity))
  }

  def arith(op: String, l: Column, r: Column): Column = {
    val bothNum = isNumeric(l) && isNumeric(r)
    val anyDouble = isStrictDoubleTyped(l) || isStrictDoubleTyped(r)
    val anyFloat = isFloatTyped(l) || isFloatTyped(r)
    val anyDecimal = isDecimalTyped(l) || isDecimalTyped(r)
    val dl = numDouble(l); val dr = numDouble(r)
    val el = numDecimal(l); val er = numDecimal(r)
    val dres = op match {
      case "+" => dl + dr
      case "-" => dl - dr
      case "*" => dl * dr
      case "/" => ieeeDiv(dl, dr)
    }
    val eres = op match {
      case "+" => el + er
      case "-" => el - er
      case "*" => (el * er).cast(DecimalType(36, 16))
      case "/" => try_divide(el, er).cast(DecimalType(36, 16)) // div by zero → error (null)
    }
    when(!bothNum, nullTerm)
      .when(anyDouble, fromDouble(dres))
      .when(anyFloat, fromFloat(dres))
      .when(lit(op == "/") || anyDecimal, fromDecimal(eres))
      // try_cast: i64 overflow → evaluation error, not an ANSI throw
      .otherwise(fromLong(eres.try_cast(LongType)))
  }

  def negate(c: Column): Column =
    when(!isNumeric(c), nullTerm)
      .when(isFloatTyped(c), fromFloat(-numDouble(c)))
      .when(isDoubleTyped(c), fromDouble(-numDouble(c)))
      .when(isDecimalTyped(c), fromDecimal(-numDecimal(c)))
      .otherwise(fromLong((-numDecimal(c)).try_cast(LongType)))

  // --------------------------------------------------------------- functions

  private val nullB = lit(null).cast(BooleanType)
  private val nullS = lit(null).cast(StringType)

  /** Keep the language/string-type of a source literal on a derived value
    * (SUBSTR/UCASE/… return same kind as input, SPARQL 17.4.3). */
  private def likeStringOf(src: Column, newVal: Column): Column =
    TermCols.literal(newVal,
      when(langTag(src).isNotNull, Rdf.langString).otherwise(nullS), langTag(src))

  /** Argument compatibility (SPARQL 17.4.3.1): arg2 simple, or same lang. */
  private def argCompatible(a: Column, b: Column): Column =
    isStringLit(a) && isStringLit(b) &&
      (langTag(b).isNull || (langTag(b) <=> langTag(a)))

  def call(name: String, args: Seq[Column], env: Env): Column = {
    def a0 = args(0); def a1 = args(1); def a2 = args(2)
    name match {
      // ---- term accessors / constructors (reference lib/functions/src/scalar/terms/)
      case "STR" => when(isLiteral(a0) || isIri(a0), str(value(a0))).otherwise(nullTerm)
      case "LANG" => when(isLiteral(a0), str(coalesce(langTag(a0), lit("")))).otherwise(nullTerm)
      case "DATATYPE" => when(isLiteral(a0), TermCols.iri(datatype(a0))).otherwise(nullTerm)
      case "IRI" | "URI" =>
        // optional 2nd arg = parser-attached query BASE (constant): resolve
        // relative references RFC3986-style; constant folding collapses the
        // base-derived prefixes at plan time
        val raw = value(a0)
        val resolved =
          if (args.size < 2) raw
          else {
            val b = value(a1)
            when(raw.rlike("^[A-Za-z][A-Za-z0-9+.\\-]*:"), raw)
              .when(raw.startsWith("#"), concat(b, raw))
              .when(raw.startsWith("/"),
                concat(regexp_extract(b, "^([A-Za-z][A-Za-z0-9+.\\-]*://[^/]*)", 1), raw))
              .otherwise(concat(regexp_replace(b, "[^/]*$", ""), raw))
          }
        when(isIri(a0), a0).when(isSimpleString(a0), TermCols.iri(resolved)).otherwise(nullTerm)
      case "BNODE" =>
        if (args.isEmpty) TermCols.bnode(expr("uuid()"))
        else {
          // Labeled form (spec §17.4.2.9): same label → same bnode WITHIN a
          // solution, distinct ACROSS solutions. env.sol is the per-solution
          // nonce the rewriter materialises for BIND chains / select-
          // expression runs; both are hashed so two labels never collide.
          val seed = env.sol.fold(value(a0))(s => concat(value(a0), lit("|"), s))
          when(isSimpleString(a0), TermCols.bnode(concat(lit("b"), md5(seed))))
            .otherwise(nullTerm)
        }
      case "STRDT" =>
        when(isSimpleString(a0) && isIri(a1),
          when(value(a1) === Xsd.string, str(value(a0)))
            .otherwise(TermCols.literal(value(a0), value(a1), nullS))).otherwise(nullTerm)
      case "STRLANG" =>
        when(isSimpleString(a0) && isSimpleString(a1) && length(value(a1)) > 0,
          langStr(value(a0), value(a1))).otherwise(nullTerm)
      case "UUID" => TermCols.iri(concat(lit("urn:uuid:"), expr("uuid()")))
      case "STRUUID" => str(expr("uuid()"))
      case "ISIRI" | "ISURI" => fromBoolean(isIri(a0))
      case "ISBLANK" => fromBoolean(isBlank(a0))
      case "ISLITERAL" => fromBoolean(isLiteral(a0))
      case "ISNUMERIC" => fromBoolean(when(a0.isNull, nullB).otherwise(isNumeric(a0)))
      case "SAMETERM" => fromBoolean(a0 === a1)

      // ---- strings (reference lib/functions/src/scalar/strings/)
      case "STRLEN" => when(isStringLit(a0), fromLong(length(value(a0)))).otherwise(nullTerm)
      case "SUBSTR" =>
        // XPath fn:substring (SPARQL 17.4.3.3): keep characters at 1-based
        // positions p with round(start) <= p < round(start) + round(length),
        // round = half-toward-+INF (floor(x+0.5): round(-1.5) = -1, unlike
        // Spark's away-from-zero). So SUBSTR("hello", 0, 2) = "h",
        // SUBSTR("12345", -3, 5) = "1", a NaN operand (or -INF+INF end)
        // yields "" — NOT an error. All arithmetic stays in double space and
        // is clamped to [1, n+1] before the int casts, so a hostile 1e300
        // start can never overflow or ANSI-throw.
        val src = value(a0)
        val nD = length(src).cast(DoubleType)
        // NaN must be tested on the RAW operands: Spark's floor() returns
        // BIGINT (NaN.toLong = 0 silently), so floor(NaN + 0.5) is not NaN.
        // ±INF survive as ±Long.Min/Max ≈ ∓9.2e18, which the [1, n+1]
        // clamps handle (and -INF start + INF length sums to -1 → empty,
        // matching XPath's NaN end).
        val s0 = numDouble(a1)
        val anyNan = if (args.size > 2) isnan(s0) || isnan(numDouble(a2)) else isnan(s0)
        val sR = floor(s0 + 0.5d).cast(DoubleType)
        val eR = if (args.size > 2) sR + floor(numDouble(a2) + 0.5d).cast(DoubleType)
                 else nD + 1.0d
        val from = least(greatest(sR, lit(1.0d)), nD + 1.0d)
        val upTo = least(greatest(eR, lit(1.0d)), nD + 1.0d)
        val cnt = upTo - from
        val picked =
          when(anyNan || cnt <= 0.0d, lit(""))
            .otherwise(src.substr(from.cast(IntegerType), cnt.cast(IntegerType)))
        when(isStringLit(a0) && isNumeric(a1) && (if (args.size > 2) isNumeric(a2) else lit(true)),
          likeStringOf(a0, picked)).otherwise(nullTerm)
      case "UCASE" => when(isStringLit(a0), likeStringOf(a0, upper(value(a0)))).otherwise(nullTerm)
      case "LCASE" => when(isStringLit(a0), likeStringOf(a0, lower(value(a0)))).otherwise(nullTerm)
      case "STRSTARTS" =>
        when(argCompatible(a0, a1), fromBoolean(value(a0).startsWith(value(a1)))).otherwise(nullTerm)
      case "STRENDS" =>
        when(argCompatible(a0, a1), fromBoolean(value(a0).endsWith(value(a1)))).otherwise(nullTerm)
      case "CONTAINS" =>
        when(argCompatible(a0, a1), fromBoolean(value(a0).contains(value(a1)))).otherwise(nullTerm)
      case "STRBEFORE" =>
        val pos = instr(value(a0), value(a1))
        when(argCompatible(a0, a1),
          when(length(value(a1)) === 0, likeStringOf(a0, lit("")))
            .when(pos > 0, likeStringOf(a0, value(a0).substr(lit(1), pos - 1)))
            .otherwise(str(lit("")))).otherwise(nullTerm)
      case "STRAFTER" =>
        val pos = instr(value(a0), value(a1))
        when(argCompatible(a0, a1),
          when(length(value(a1)) === 0, likeStringOf(a0, value(a0)))
            .when(pos > 0, likeStringOf(a0,
              value(a0).substr(pos + length(value(a1)), length(value(a0)))))
            .otherwise(str(lit("")))).otherwise(nullTerm)
      case "ENCODE_FOR_URI" =>
        // url_encode is Java form-encoding; XPath fn:encode-for-uri differs:
        // space is %20 (not '+'), '~' stays unescaped, '*' must be escaped
        when(isStringLit(a0),
          str(regexp_replace(regexp_replace(regexp_replace(
            url_encode(value(a0)), "\\+", "%20"), "%7E", "~"), "\\*", "%2A")))
          .otherwise(nullTerm)
      case "CONCAT" =>
        if (args.isEmpty) str(lit(""))
        else {
          val allString = args.map(isStringLit).reduce(_ && _)
          val sameLang = args.map(langTag).reduce((x, y) => when(x <=> y, x).otherwise(nullS))
          val allLang = args.map(a => langTag(a).isNotNull).reduce(_ && _)
          when(allString, TermCols.literal(concat(args.map(value): _*),
            when(allLang && sameLang.isNotNull, Rdf.langString).otherwise(nullS),
            when(allLang, sameLang).otherwise(nullS))).otherwise(nullTerm)
        }
      case "LANGMATCHES" =>
        val tag = lower(value(a0)); val range = lower(value(a1))
        when(isSimpleString(a0) && isSimpleString(a1),
          fromBoolean(when(range === "*", length(tag) > 0)
            .otherwise(tag === range || tag.startsWith(concat(range, lit("-")))))).otherwise(nullTerm)
      case "REGEX" =>
        val pat = if (args.size > 2) regexWithFlags(value(a1), value(a2)) else value(a1)
        when(isStringLit(a0) && isSimpleString(a1), fromBoolean(regexp_like(value(a0), pat)))
          .otherwise(nullTerm)
      case "REPLACE" =>
        val pat = if (args.size > 3) regexWithFlags(value(a1), value(args(3))) else value(a1)
        when(isStringLit(a0) && isSimpleString(a1) && isSimpleString(a2),
          likeStringOf(a0, regexp_replace(value(a0), pat, value(a2)))).otherwise(nullTerm)
      case "MD5" => when(isSimpleString(a0), str(md5(value(a0)))).otherwise(nullTerm)
      case "SHA1" => when(isSimpleString(a0), str(sha1(value(a0)))).otherwise(nullTerm)
      case "SHA256" => when(isSimpleString(a0), str(sha2(value(a0), 256))).otherwise(nullTerm)
      case "SHA384" => when(isSimpleString(a0), str(sha2(value(a0), 384))).otherwise(nullTerm)
      case "SHA512" => when(isSimpleString(a0), str(sha2(value(a0), 512))).otherwise(nullTerm)

      // ---- numeric (reference lib/functions/src/scalar/numeric/)
      case "ABS" => numericUnary(a0, d => abs(d), e => abs(e))
      case "CEIL" => numericUnary(a0, d => ceil(d).cast(DoubleType), e => ceil(e).cast(DecimalType(36, 16)))
      case "FLOOR" => numericUnary(a0, d => floor(d).cast(DoubleType), e => floor(e).cast(DecimalType(36, 16)))
      case "ROUND" =>
        // XPath round: half toward +infinity (-2.5 → -2); Spark round is
        // half away from zero, so use floor(x + 0.5)
        numericUnary(a0, d => floor(d + 0.5).cast(DoubleType),
          e => floor(e + lit(BigDecimal(0.5))).cast(DecimalType(36, 16)))
      case "RAND" => fromDouble(rand())

      // ---- dates & times (reference lib/functions/src/scalar/dates_and_times/)
      // extract from the LEXICAL form: SPARQL accessors see the literal's own
      // timezone, so converting through Spark timestamps (session-TZ
      // normalising) would be wrong.
      case "YEAR" => dtPart(a0, "^(-?\\d{4,})", _.cast(LongType))
      case "MONTH" => dtPart(a0, "^-?\\d{4,}-(\\d{2})", _.cast(LongType))
      case "DAY" => dtPart(a0, "^-?\\d{4,}-\\d{2}-(\\d{2})", _.cast(LongType))
      case "HOURS" => dtPart(a0, "T(\\d{2})", _.cast(LongType))
      case "MINUTES" => dtPart(a0, "T\\d{2}:(\\d{2})", _.cast(LongType))
      case "SECONDS" =>
        when(isDateTimeLit(a0), fromDecimal(
          regexp_extract(value(a0), "T\\d{2}:\\d{2}:(\\d{2}(?:\\.\\d+)?)", 1)
            .cast(DecimalType(36, 16)))).otherwise(nullTerm)
      case "TZ" =>
        when(isDateTimeLit(a0),
          str(regexp_extract(value(a0), "(Z|[+-]\\d{2}:\\d{2})$", 1))).otherwise(nullTerm)
      case "TIMEZONE" =>
        val tz = regexp_extract(value(a0), "(Z|[+-]\\d{2}:\\d{2})$", 1)
        val h = regexp_extract(tz, "^[+-](\\d{2})", 1).cast(IntegerType)
        val m = regexp_extract(tz, ":(\\d{2})$", 1).cast(IntegerType)
        val sign = when(tz.startsWith("-"), lit("-")).otherwise(lit(""))
        val dur = when(tz === "Z" || (h === 0 && m === 0), lit("PT0S"))
          .otherwise(concat(sign, lit("PT"),
            when(h > 0, concat(h.cast(StringType), lit("H"))).otherwise(lit("")),
            when(m > 0, concat(m.cast(StringType), lit("M"))).otherwise(lit(""))))
        when(isDateTimeLit(a0) && length(tz) > 0, TermCols.typedLit(dur, Xsd.dayTimeDuration))
          .otherwise(nullTerm)
      case "NOW" => fromTimestamp(current_timestamp())

      // ---- XSD constructor casts (reference lib/functions/src/scalar/conversion/)
      case n if n.startsWith(XsdNs) => xsdCast(n, a0, env)

      case other =>
        Registry.lookup(other) match {
          case Some(f) => f(args)
          case None => throw new IllegalArgumentException(s"unknown function $other")
        }
    }
  }

  private val XsdNs = "http://www.w3.org/2001/XMLSchema#"

  private def isDateTimeLit(c: Column): Column =
    isLiteral(c) && datatypeRaw(c).isin(Xsd.dateTime, Xsd.date, Xsd.time)

  private def dtPart(c: Column, re: String, f: Column => Column): Column =
    when(isDateTimeLit(c), fromLong(f(regexp_extract(value(c), re, 1)))).otherwise(nullTerm)

  private def numericUnary(c: Column, d: Column => Column, e: Column => Column): Column =
    when(!isNumeric(c), nullTerm)
      .when(isFloatTyped(c), fromFloat(d(numDouble(c))))
      .when(isDoubleTyped(c), fromDouble(d(numDouble(c))))
      .when(isDecimalTyped(c), fromDecimal(e(numDecimal(c))))
      .otherwise(fromLong(e(numDecimal(c)).try_cast(LongType)))

  /** XPath/XQuery regex flags (17.4.3.14): s,m,i,x map to the same-letter
    * Java embedded flags; `q` treats the PATTERN as a literal string
    * (quoted via \Q…\E with the embedded-\E split, Pattern.quote's
    * algorithm — the reference escapes with regex::escape,
    * lib/functions/src/scalar/strings/regex.rs:117); any other flag char
    * is an evaluation error (null pattern → fromBoolean/likeStringOf
    * propagate the error term), matching the reference's ThinError. */
  private def regexWithFlags(pat: Column, flags: Column): Column = {
    val f = coalesce(flags, lit(""))
    val quoted = concat(lit("\\Q"),
      regexp_replace(pat, "\\\\E", "\\\\E\\\\\\\\E\\\\Q"), lit("\\E"))
    val rest = translate(f, "q", "")
    val base = when(f.contains("q"), quoted).otherwise(pat)
    val withInline = when(length(rest) > 0,
      concat(lit("(?"), rest, lit(")"), base)).otherwise(base)
    when(f.rlike("^[smixq]*$"), withInline).otherwise(lit(null).cast(StringType))
  }

  /** XPath casting rules (reference lib/functions/src/scalar/conversion/cast_*.rs):
    * invalid lexical form → error (NULL), unlike Spark cast's silent coercions.
    * The parsed native value `v` is materialised via env.bind — the term
    * constructors reference it up to ~10× (lexical canonicalisation + num
    * field + null guard), and codegen does NOT common up subexpressions
    * inside CASE branches, so inlining multiplied the whole dispatch CASE
    * per reference (BI-Q4's AVG(xsd:float(...)) paid ~5 µs/row for it). */
  def xsdCast(target: String, c: Column, env: Env = envOf(Set.empty)): Column = target match {
    case t if t == Xsd.string =>
      when(isLiteral(c) || isIri(c), str(value(c))).otherwise(nullTerm)
    case t if t == Xsd.boolean =>
      // NaN → false (reference lib/model/src/xsd/boolean.rs:75-82 requires
      // !is_nan; Spark's NaN =!= 0.0 is TRUE under its total ordering)
      when(boolValue(c).isNotNull, fromBoolean(boolValue(c)))
        .when(isNumeric(c), fromBoolean(numDouble(c) =!= 0.0 && !isnan(numDouble(c))))
        .when(isSimpleString(c) && value(c).isin("true", "1"), fromBoolean(lit(true)))
        .when(isSimpleString(c) && value(c).isin("false", "0"), fromBoolean(lit(false)))
        .otherwise(nullTerm)
    case t if t == Xsd.double || t == Xsd.float =>
      val v = env.bind(when(isNumeric(c) || isSimpleString(c), value(c).try_cast(DoubleType))
        .when(boolValue(c).isNotNull, boolValue(c).cast(DoubleType)))
      when(v.isNotNull, TermCols.typedLit(dblLex(v), t)).otherwise(nullTerm)
    case t if t == Xsd.decimal =>
      val v = env.bind(when(isNumeric(c) || isSimpleString(c), value(c).try_cast(DecimalType(36, 16)))
        .when(boolValue(c).isNotNull, boolValue(c).cast(DecimalType(36, 16))))
      when(v.isNotNull, fromDecimal(v)).otherwise(nullTerm)
    case t if t == Xsd.integer || t == Xsd.int || t == Xsd.long =>
      // "1.5" → error; "1"/bool/int-valued numerics fine; double 1.9 truncates per XPath
      val fromStr = when(value(c).rlike("^[+-]?\\d+$"), value(c).try_cast(LongType))
      val v = env.bind(when(isSimpleString(c), fromStr)
        .when(isNumeric(c), numDecimal(c).cast(LongType))
        .when(boolValue(c).isNotNull, boolValue(c).cast(LongType)))
      when(v.isNotNull, fromLong(v)).otherwise(nullTerm)
    case t if t == Xsd.dateTime =>
      // XSD dateTime lexical space: 'T' separator mandatory, optional
      // fraction/timezone. Spark's default timestamp parser is far more
      // lenient (date-only, space separator) — guard with the XSD shape so
      // string casts match the reference's strict parser
      // (lib/model/src/xsd/date_time.rs). Residual divergence: XSD's
      // 24:00:00 end-of-day form is rejected here (Spark cannot represent
      // the parse), where the reference normalises it to the next day.
      when(tsValue(c).isNotNull && datatypeRaw(c) === Xsd.dateTime, c)
        .when(isSimpleString(c) &&
            value(c).rlike("^-?\\d{4,}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})?$") &&
            try_to_timestamp(value(c)).isNotNull, TermCols.typedLit(value(c), Xsd.dateTime))
        .when(datatypeRaw(c) === Xsd.date, TermCols.typedLit(concat(value(c), lit("T00:00:00")), Xsd.dateTime))
        .otherwise(nullTerm)
    case t if t == Xsd.date =>
      when(datatypeRaw(c) === Xsd.date, c)
        .when(datatypeRaw(c) === Xsd.dateTime, TermCols.typedLit(substring(value(c), 1, 10), Xsd.date))
        // anchored: XSD date is the full lexical plus an optional timezone —
        // a prefix match would admit trailing garbage
        .when(isSimpleString(c) &&
            value(c).rlike("^-?\\d{4,}-\\d{2}-\\d{2}(Z|[+-]\\d{2}:\\d{2})?$"),
          TermCols.typedLit(value(c), Xsd.date))
        .otherwise(nullTerm)
    case other =>
      // unknown cast IRI: treat as extension-typed literal constructor
      when(isLiteral(c), TermCols.literal(value(c), lit(other), nullS)).otherwise(nullTerm)
  }

  private def dblLex(d: Column): Column = {
    // specials first: NaN/±Inf → LongType throws under ANSI, and the XSD
    // canonical lexicals are "NaN"/"INF"/"-INF" (Spark's cast PARSES those
    // special strings case-insensitively, so round trips hold)
    when(isnan(d), lit("NaN"))
      .when(d === Double.PositiveInfinity, lit("INF"))
      .when(d === Double.NegativeInfinity, lit("-INF"))
      .when(abs(d) < 1e15 && d === d.cast(LongType).cast(DoubleType),
        d.cast(LongType).cast(StringType))
      .otherwise(d.cast(StringType))
  }

  /** Custom function registry by IRI (reference
    * lib/extensions/src/functions/registry.rs + name.rs:8-13). */
  object Registry {
    private var fns = Map.empty[String, Seq[Column] => Column]
    def register(iri: String, f: Seq[Column] => Column): Unit = synchronized { fns += (iri -> f) }
    def lookup(iri: String): Option[Seq[Column] => Column] = fns.get(iri)
  }
}
