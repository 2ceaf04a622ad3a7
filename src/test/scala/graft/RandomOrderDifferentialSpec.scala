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
    if (cat(a) != cat(b)) Some(Integer.compare(cat(a), cat(b)))
    else (numOf(a), numOf(b)) match {
      case (Some(x), Some(y)) if x != y => Some(x.compare(y))
      case (Some(_), Some(_)) => Some(0) // equal value, ties free
      case _ => (strOf(a), strOf(b)) match {
        case (Some(x), Some(y)) => Some(x.compareTo(y))
        case _ => None // mixed literal kinds / IRI-vs-IRI etc: unspecified
      }
    }
  }

  private def randomCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val terms: Seq[RdfTerm] = Seq(
      Iri("urn:a"), Iri("urn:b"), BNode("b1"), BNode("b2"),
      Lit("9", Xsd.integer, None), Lit("10", Xsd.integer, None),
      Lit("09.5", Xsd.decimal, None), Lit("-2", Xsd.integer, None),
      Lit("1.0E1", Xsd.double, None), Lit("0", Xsd.integer, None),
      Lit.simple("apple"), Lit.simple("Banana"), Lit.simple(""))
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
    (800 to 819).foreach(randomCase)
  }
}
