package graft

import graft.engine.Graft
import graft.model._
import graft.sources.Turtle

/**
 * Randomised ORDER BY property test over the sortable term encoding: random
 * term soups (bnodes, IRIs, numeric literals across int/decimal/double with
 * non-canonical lexical forms, simple strings), ORDER BY ASC and DESC.
 *
 * SPARQL §15.1 defines only a PARTIAL order (unbound < bnodes < IRIs <
 * literals; numerics by value; strings by codepoint) and leaves e.g.
 * IRI-vs-IRI unspecified, so instead of an exact-match oracle this asserts:
 * (1) the result is a permutation of the solutions, and (2) NO pair at
 * positions i<j is strictly ordered the wrong way under the defined partial
 * order — any violation (e.g. "10"^^xsd:integer sorting before
 * "9"^^xsd:integer lexically, or a literal before an IRI) fails.
 */
class RandomOrderDifferentialSpec extends SparkSpec {

  /** Partial order: Some(-1/0/1) where SPARQL defines it, None elsewhere. */
  private def partialCompare(a: RdfTerm, b: RdfTerm): Option[Int] = {
    def cat(t: RdfTerm): Int = t match {
      case BNode(_) => 0
      case Iri(_) => 1
      case Lit(_, _, _) => 2
    }
    def numOf(t: RdfTerm): Option[BigDecimal] = t match {
      case Lit(v, dt, None) if Xsd.numericTypes.contains(dt) =>
        scala.util.Try(BigDecimal(v.trim)).toOption
      case _ => None
    }
    def strOf(t: RdfTerm): Option[String] = t match {
      case Lit(v, dt, None) if dt == null || dt == Xsd.string => Some(v)
      case _ => None
    }
    // xsd:time: timeline seconds (tz-normalized, naive = UTC)
    def timeOf(t: RdfTerm): Option[Double] = t match {
      case Lit(v, dt, None) if dt == Xsd.time =>
        val re = "([0-2][0-9]):([0-5][0-9]):([0-5][0-9](?:\\.[0-9]+)?)(Z|[+-][0-9]{2}:[0-9]{2})?".r
        v match {
          case re(h, m, sec, tz) =>
            val off = Option(tz).filter(_ != "Z").map { z =>
              val sign = if (z.startsWith("-")) -1 else 1
              sign * (z.substring(1, 3).toInt * 3600 + z.substring(4, 6).toInt * 60)
            }.getOrElse(0)
            Some(h.toInt * 3600.0 + m.toInt * 60.0 + sec.toDouble - off)
          case _ => None
        }
      case _ => None
    }
    // duration family: (months, seconds); compared via the XSD spec's four
    // reference dates with java.time — INDEPENDENT of the engine's Catalyst
    // expression implementation (which uses a different first probe date)
    def durOf(t: RdfTerm): Option[(Long, Double)] = t match {
      case Lit(v, dt, None) if dt == Xsd.duration || dt == Xsd.yearMonthDuration ||
          dt == Xsd.dayTimeDuration =>
        val re = ("(-)?P(?:([0-9]+)Y)?(?:([0-9]+)M)?(?:([0-9]+)D)?" +
          "(?:T(?:([0-9]+)H)?(?:([0-9]+)M)?(?:([0-9]+(?:\\.[0-9]+)?)S)?)?").r
        v match {
          case re(sg, y, mo, d, h, mi, sec) =>
            val sign = if (sg != null) -1 else 1
            def g(x: String) = Option(x).map(_.toLong).getOrElse(0L)
            Some((sign * (g(y) * 12 + g(mo)),
              sign * (g(d) * 86400.0 + g(h) * 3600.0 + g(mi) * 60.0 +
                Option(sec).map(_.toDouble).getOrElse(0.0))))
          case _ => None
        }
      case _ => None
    }
    def durCompare(a: (Long, Double), b: (Long, Double)): Option[Int] = {
      val refs = Seq("1696-09-01", "1697-02-01", "1903-03-01", "1903-07-01")
      val cs = refs.map { r =>
        def probe(p: (Long, Double)) =
          java.time.LocalDate.parse(r).plusMonths(p._1).toEpochDay * 86400.0 + p._2
        java.lang.Double.compare(probe(a), probe(b))
      }
      if (cs.forall(_ < 0)) Some(-1)
      else if (cs.forall(_ > 0)) Some(1)
      else if (cs.forall(_ == 0)) Some(0)
      else None // indeterminate (e.g. P1M vs P30D): order unspecified
    }
    if (cat(a) != cat(b)) Some(Integer.compare(cat(a), cat(b)))
    else (numOf(a), numOf(b)) match {
      case (Some(x), Some(y)) if x != y => Some(x.compare(y))
      case (Some(_), Some(_)) => Some(0) // equal value, ties free
      case _ => (timeOf(a), timeOf(b)) match {
        case (Some(x), Some(y)) => Some(java.lang.Double.compare(x, y))
        case _ => (durOf(a), durOf(b)) match {
          case (Some(x), Some(y)) => durCompare(x, y)
          case _ => (strOf(a), strOf(b)) match {
            case (Some(x), Some(y)) => Some(x.compareTo(y))
            case _ => None // mixed literal kinds / IRI-vs-IRI etc: unspecified
          }
        }
      }
    }
  }

  private val baseTerms: Seq[RdfTerm] = Seq(
    Iri("urn:a"), Iri("urn:b"), BNode("b1"), BNode("b2"),
    Lit("9", Xsd.integer, None), Lit("10", Xsd.integer, None),
    Lit("09.5", Xsd.decimal, None), Lit("-2", Xsd.integer, None),
    Lit("1.0E1", Xsd.double, None), Lit("0", Xsd.integer, None),
    Lit.simple("apple"), Lit.simple("Banana"), Lit.simple(""))

  private val temporalTerms: Seq[RdfTerm] = Seq(
    Lit("12:00:00", Xsd.time, None), Lit("05:00:00+02:00", Xsd.time, None),
    Lit("23:59:59Z", Xsd.time, None), Lit("00:00:01-01:30", Xsd.time, None),
    Lit("P1Y", Xsd.yearMonthDuration, None), Lit("P12M", Xsd.duration, None),
    Lit("P30D", Xsd.dayTimeDuration, None), Lit("PT26H", Xsd.dayTimeDuration, None),
    Lit("P1M", Xsd.duration, None), Lit("-P1D", Xsd.duration, None),
    Lit("PT0.5S", Xsd.dayTimeDuration, None))

  private def randomCase(seed: Int, soup: Seq[RdfTerm]): Unit = {
    val rnd = new scala.util.Random(seed)
    val terms = soup
    val objs = Seq.fill(8 + rnd.nextInt(8))(terms(rnd.nextInt(terms.size)))
    val triples = objs.zipWithIndex.map { case (o, i) =>
      ((Iri(s"urn:s$i"): RdfTerm), Iri("urn:p"), o)
    }
    val quads = Turtle.quadsToDF(spark, triples.map(t => RdfQuad(None, t._1, t._2, t._3)))
    val desc = rnd.nextBoolean()
    val dir = if (desc) "DESC(?x)" else "?x"
    val df = Graft(quads).select(s"SELECT ?x WHERE { ?s <urn:p> ?x } ORDER BY $dir")
    val got: Seq[RdfTerm] = df.collect().toSeq.map { r =>
      val st = r.getStruct(r.fieldIndex("x"))
      st.getByte(0) match {
        case 0 => Iri(st.getString(1))
        case 1 => BNode(st.getString(1))
        case _ => Lit(st.getString(1),
          Option(st.getString(2)).getOrElse(Xsd.string), Option(st.getString(3)))
      }
    }
    // permutation: same multiset of objects (bnode labels may be renamed —
    // compare category counts for bnodes, exact terms otherwise)
    def key(t: RdfTerm): String = t match {
      case BNode(_) => "bnode"
      case other => other.toString
    }
    assert(got.map(key).sorted == objs.map(key).sorted,
      s"seed=$seed: not a permutation\ngot=$got\nin=$objs")
    // no pair ordered the wrong way under the defined partial order
    for (i <- got.indices; j <- i + 1 until got.size) {
      partialCompare(got(i), got(j)).foreach { c =>
        val bad = if (desc) c < 0 else c > 0
        assert(!bad,
          s"seed=$seed desc=$desc: position $i=${got(i)} vs $j=${got(j)} violates order\ngot=$got")
      }
    }
  }

  test("ORDER BY respects the SPARQL partial order on 20 random term soups") {
    (800 to 819).foreach(randomCase(_, baseTerms))
  }

  test("ORDER BY respects the partial order on soups with xsd:time and durations") {
    // mixed soups exercise the sortable encoding's time/duration branches
    // against an independent java.time four-probe oracle
    (900 to 915).foreach(randomCase(_, baseTerms ++ temporalTerms))
  }
}
