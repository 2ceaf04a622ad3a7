package graft

import graft.engine.Graft
import graft.model._
import graft.sources.Turtle

/**
 * Randomised scalar-expression differential (§2.8): random expression trees
 * over VALUES-bound variables and literals, evaluated by the engine via
 * BIND and by a driver-side model of the SPARQL 1.1 operator semantics —
 * numeric promotion (integer op integer stays integer w/ i64 overflow →
 * error, any double promotes), the operator-mapping error-vs-false split
 * for `=` vs order comparisons (IRI = IRI is sameTerm-false, literal =
 * literal of incomparable kinds is an ERROR, `<` outside numeric/string/
 * boolean is an ERROR), three-valued && / || / ! over EBV, and the
 * string-function domains (STRLEN/UCASE on any string literal incl.
 * lang-tagged, CONTAINS argument-compatibility, STR flattening to a simple
 * literal with the canonical double lexical).
 *
 * Complements FunctionsSpec (curated edges) and the W3C slice with
 * unbiased composition: errors arising mid-tree must propagate exactly.
 * Values are kept small/finite (no INF/NaN sources, no division) so the
 * model and engine share IEEE-semantics-free ground; the curated tests own
 * the specials. ~25 expressions ride ONE query per seed (independent BINDs
 * over a single VALUES row) so the whole spec costs a handful of Spark
 * jobs; more per query overflows whole-stage codegen's 64KB method limit
 * (janino falls back to interpreted and the spec crawls).
 */
// 570 s of the measured 1687 s full-suite runtime (r10 timing run):
// excluded from the driver's budgeted `sbt test` gate, still run in the
// builder's own loop (see build.sbt testOptions).
@graft.SlowTest
class RandomExprDifferentialSpec extends SparkSpec {

  // ----- model terms ------------------------------------------------------
  private sealed trait T
  private case class TI(v: BigInt) extends T
  private case class TD(v: Double) extends T
  private case class TB(v: Boolean) extends T
  private case class TS(v: String, lang: Option[String]) extends T
  private case class TIri(v: String) extends T

  // ----- expressions ------------------------------------------------------
  private sealed trait Ex
  private case class EVar(n: String) extends Ex
  private case class EConst(t: T) extends Ex
  private case class EUn(op: String, a: Ex) extends Ex // "!", "neg"
  private case class EBin(op: String, a: Ex, b: Ex) extends Ex
  private case class EFn(name: String, args: Seq[Ex]) extends Ex

  private def renderT(t: T): String = t match {
    case TI(v) => v.toString
    case TD(v) => "\"" + v.toString + "\"^^<http://www.w3.org/2001/XMLSchema#double>"
    case TB(v) => v.toString
    case TS(v, None) => "\"" + v + "\""
    case TS(v, Some(l)) => "\"" + v + "\"@" + l
    case TIri(v) => s"<$v>"
  }
  private def render(e: Ex): String = e match {
    case EVar(n) => s"?$n"
    case EConst(t) => renderT(t)
    case EUn("!", a) => s"(!(${render(a)}))"
    case EUn("neg", a) => s"(-(${render(a)}))"
    case EUn(op, _) => sys.error(op)
    case EBin(op, a, b) => s"(${render(a)} $op ${render(b)})"
    case EFn(n, args) => s"$n(${args.map(render).mkString(", ")})"
  }

  // ----- model evaluation -------------------------------------------------
  private val LongMin = BigInt(Long.MinValue); private val LongMax = BigInt(Long.MaxValue)
  private def longOk(v: BigInt): Option[T] = if (v >= LongMin && v <= LongMax) Some(TI(v)) else None

  /** Canonical double lexical the engine renders (ExprCompiler.dblLex):
    * integral magnitudes under 1e15 print as longs, else JVM toString. */
  private def dblLex(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "INF"
    else if (d == Double.NegativeInfinity) "-INF"
    else if (math.abs(d) < 1e15 && d == d.toLong.toDouble) d.toLong.toString
    else d.toString

  private def ebv(t: T): Option[Boolean] = t match {
    case TB(v) => Some(v)
    case TI(v) => Some(v != 0)
    case TD(v) => Some(!v.isNaN && v != 0.0)
    case TS(v, _) => Some(v.nonEmpty) // plain literals incl. lang-tagged
    case TIri(_) => None
  }

  private def isStr(t: T): Boolean = t match { case TS(_, _) => true; case _ => false }

  private def ev(e: Ex, env: Map[String, T]): Option[T] = e match {
    case EVar(n) => env.get(n) // unbound = error
    case EConst(t) => Some(t)
    case EUn("!", a) => ev(a, env).flatMap(ebv).map(b => TB(!b))
    case EUn("neg", a) => ev(a, env).flatMap {
      case TI(v) => longOk(-v)
      case TD(v) => Some(TD(-v))
      case _ => None
    }
    case EBin(op @ ("+" | "-" | "*"), a, b) =>
      for {
        x <- ev(a, env); y <- ev(b, env)
        r <- (x, y) match {
          case (TI(l), TI(r0)) =>
            longOk(op match { case "+" => l + r0; case "-" => l - r0; case _ => l * r0 })
          case (l, r0) if numD(l).isDefined && numD(r0).isDefined =>
            val (dl, dr) = (numD(l).get, numD(r0).get)
            Some(TD(op match { case "+" => dl + dr; case "-" => dl - dr; case _ => dl * dr }))
          case _ => None
        }
      } yield r
    case EBin(op @ ("&&" | "||"), a, b) =>
      val l = ev(a, env).flatMap(ebv); val r = ev(b, env).flatMap(ebv)
      val res = op match {
        case "&&" =>
          if (l.contains(false) || r.contains(false)) Some(false)
          else if (l.contains(true) && r.contains(true)) Some(true) else None
        case _ =>
          if (l.contains(true) || r.contains(true)) Some(true)
          else if (l.contains(false) && r.contains(false)) Some(false) else None
      }
      res.map(TB(_))
    case EBin(op, a, b) => // comparison operators
      for { x <- ev(a, env); y <- ev(b, env); r <- cmp(op, x, y) } yield r
    case EFn("IF", Seq(c, t, f)) =>
      ev(c, env).flatMap(ebv).flatMap(b => if (b) ev(t, env) else ev(f, env))
    case EFn("COALESCE", args) =>
      args.iterator.map(ev(_, env)).collectFirst { case Some(t) => t }
    case EFn("BOUND", Seq(EVar(n))) => Some(TB(env.contains(n)))
    case EFn("STR", Seq(a)) => ev(a, env).map {
      case TI(v) => TS(v.toString, None)
      case TD(v) => TS(dblLex(v), None)
      case TB(v) => TS(v.toString, None)
      case TS(v, _) => TS(v, None)
      case TIri(v) => TS(v, None)
    }
    case EFn("STRLEN", Seq(a)) => ev(a, env).flatMap {
      case TS(v, _) => Some(TI(v.length))
      case _ => None
    }
    case EFn("UCASE", Seq(a)) => ev(a, env).flatMap {
      case TS(v, l) => Some(TS(v.toUpperCase, l))
      case _ => None
    }
    case EFn("CONTAINS", Seq(a, b)) =>
      for {
        x <- ev(a, env); y <- ev(b, env)
        r <- (x, y) match {
          // 17.4.3.1 argument compatibility: arg2 simple or same lang
          case (TS(v1, l1), TS(v2, l2)) if l2.isEmpty || l2 == l1 => Some(TB(v1.contains(v2)))
          case _ => None
        }
      } yield r
    case EFn("ABS", Seq(a)) => ev(a, env).flatMap {
      case TI(v) => longOk(v.abs)
      case TD(v) => Some(TD(math.abs(v)))
      case _ => None
    }
    case other => sys.error(s"unmodeled $other")
  }

  private def numD(t: T): Option[Double] = t match {
    case TI(v) => Some(v.toDouble)
    case TD(v) => Some(v)
    case _ => None
  }

  /** SPARQL operator mapping: `=`/`!=` fall back to RDFterm-equal (IRI/IRI
    * and IRI/literal compare as terms; literal/literal of incomparable
    * kinds is an ERROR); order comparisons are defined only for
    * numeric/simple-string/boolean pairs, ERROR otherwise. */
  private def cmp(op: String, x: T, y: T): Option[T] = {
    def fromCmp(c: Int): Option[T] = Some(TB(op match {
      case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0
      case ">=" => c >= 0; case "=" => c == 0; case _ => c != 0
    }))
    (x, y) match {
      case (l, r) if numD(l).isDefined && numD(r).isDefined =>
        (l, r) match {
          case (TI(a), TI(b)) => fromCmp(a.compare(b))
          case _ => fromCmp(java.lang.Double.compare(numD(l).get, numD(r).get))
        }
      case (TS(a, None), TS(b, None)) => fromCmp(a.compareTo(b))
      case (TB(a), TB(b)) => fromCmp(a.compareTo(b))
      case _ if op == "=" || op == "!=" =>
        val same = x == y
        (x, y) match {
          case (TIri(_), _) | (_, TIri(_)) =>
            Some(TB(if (op == "=") same else !same)) // sameTerm false, not error
          case _ if same => Some(TB(op == "="))
          case _ => None // both literals, incomparable kinds: type error
        }
      case _ => None // no order mapping (lang-tagged, IRIs, mixed)
    }
  }

  // ----- generation -------------------------------------------------------
  private val atomPool: Seq[T] = Seq(
    TI(0), TI(1), TI(2), TI(7), TI(-3),
    TD(0.0), TD(1.5), TD(-2.5), TD(100.0),
    TB(true), TB(false),
    TS("", None), TS("a", None), TS("Ab", None), TS("x", Some("en")),
    TIri("urn:x:i1"), TIri("urn:x:i2"))

  private def genExpr(rnd: scala.util.Random, depth: Int): Ex = {
    val vars = Seq("a", "b", "c")
    if (depth == 0 || rnd.nextInt(4) == 0) {
      if (rnd.nextBoolean()) EVar(vars(rnd.nextInt(3)))
      else EConst(atomPool(rnd.nextInt(atomPool.size)))
    } else rnd.nextInt(10) match {
      case 0 => EUn("!", genExpr(rnd, depth - 1))
      case 1 => EUn("neg", genExpr(rnd, depth - 1))
      case 2 | 3 =>
        EBin(Seq("+", "-", "*")(rnd.nextInt(3)), genExpr(rnd, depth - 1), genExpr(rnd, depth - 1))
      case 4 | 5 =>
        EBin(Seq("<", "<=", "=", "!=", ">=", ">")(rnd.nextInt(6)),
          genExpr(rnd, depth - 1), genExpr(rnd, depth - 1))
      case 6 =>
        EBin(Seq("&&", "||")(rnd.nextInt(2)), genExpr(rnd, depth - 1), genExpr(rnd, depth - 1))
      case 7 =>
        EFn("IF", Seq(genExpr(rnd, depth - 1), genExpr(rnd, depth - 1), genExpr(rnd, depth - 1)))
      case 8 => rnd.nextInt(4) match {
        case 0 => EFn("COALESCE", Seq(genExpr(rnd, depth - 1), genExpr(rnd, depth - 1)))
        case 1 => EFn("STR", Seq(genExpr(rnd, depth - 1)))
        case 2 => EFn("BOUND", Seq(EVar(vars(rnd.nextInt(3)))))
        case _ => EFn("ABS", Seq(genExpr(rnd, depth - 1)))
      }
      case _ => rnd.nextInt(3) match {
        case 0 => EFn("STRLEN", Seq(genExpr(rnd, depth - 1)))
        case 1 => EFn("UCASE", Seq(genExpr(rnd, depth - 1)))
        case _ => EFn("CONTAINS", Seq(genExpr(rnd, depth - 1), genExpr(rnd, depth - 1)))
      }
    }
  }

  // ----- engine-vs-model --------------------------------------------------
  private def runSeed(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val assign: Map[String, T] = Seq("a", "b", "c").flatMap { v =>
      if (rnd.nextInt(5) == 0) None // UNDEF
      else Some(v -> atomPool(rnd.nextInt(atomPool.size)))
    }.toMap
    val exprs = Seq.fill(8)(genExpr(rnd, 3))

    val valuesRow = Seq("a", "b", "c")
      .map(v => assign.get(v).map(renderT).getOrElse("UNDEF")).mkString("(", " ", ")")
    val binds = exprs.zipWithIndex
      .map { case (e, i) => s"BIND(${render(e)} AS ?r$i)" }.mkString("\n  ")
    val q =
      s"""SELECT * WHERE {
         |  VALUES (?a ?b ?c) { $valuesRow }
         |  $binds
         |}""".stripMargin

    val row = Graft(Turtle.quadsToDF(spark, Nil)).select(q).collect() match {
      case Array(r) => r
      case other => fail(s"seed=$seed expected 1 row, got ${other.length}\n$q")
    }
    exprs.zipWithIndex.foreach { case (e, i) =>
      val idx = row.fieldIndex(s"r$i")
      val got: Option[(String, String, String, String)] =
        if (row.isNullAt(idx)) None
        else {
          val st = row.getStruct(idx)
          Some((st.getByte(0).toString, st.getString(1),
            Option(st.getString(2)).getOrElse(""), Option(st.getString(3)).getOrElse("")))
        }
      val expected = ev(e, assign)
      def show(t: Option[T]) = t.fold("ERROR")(_.toString)
      val ok = (expected, got) match {
        case (None, None) => true
        case (Some(t), Some((ty, v, dt, lang))) => t match {
          case TI(x) => dt == Xsd.integer && BigInt(v) == x
          case TD(x) =>
            dt == Xsd.double && {
              val g = v match {
                case "INF" => Double.PositiveInfinity
                case "-INF" => Double.NegativeInfinity
                case "NaN" => Double.NaN
                case s => s.toDouble
              }
              (g.isNaN && x.isNaN) || g == x
            }
          case TB(x) => dt == Xsd.boolean && v == x.toString
          case TS(x, l) =>
            v == x && l.getOrElse("") == lang &&
              (dt.isEmpty || dt == Xsd.string || dt == Rdf.langString)
          case TIri(x) => ty == "0" && v == x
        }
        case _ => false
      }
      assert(ok,
        s"""seed=$seed expr ${render(e)}
           |assign=$assign
           |expected=${show(expected)}
           |got=$got""".stripMargin)
    }
  }

  (1 to 12).foreach { seed =>
    test(s"random expression tree ≡ operator-semantics model (seed $seed)") {
      runSeed(seed)
    }
  }
}
