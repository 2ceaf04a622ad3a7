package graft

import graft.engine.Graft
import graft.model._
import graft.sources.Turtle

/**
 * Randomised engine differential: random small graphs × random BGP /
 * OPTIONAL queries, evaluated both by the engine and by a naive driver-side
 * bag-semantics evaluator. Complements the curated W3C/oxigraph fixtures
 * with unbiased shapes (shared variables in any position, self-joins,
 * triangles, unbound OPTIONAL vars). Seeds fixed — reproducible.
 */
class RandomBgpDifferentialSpec extends SparkSpec {

  private type Binding = Map[String, RdfTerm]

  /** Naive bag-semantics BGP join over a triple list. */
  private def naiveBgp(triples: Seq[(RdfTerm, RdfTerm, RdfTerm)],
                       patterns: Seq[(Either[String, RdfTerm], Either[String, RdfTerm], Either[String, RdfTerm])]): Seq[Binding] = {
    def matchOne(b: Binding, tp: (Either[String, RdfTerm], Either[String, RdfTerm], Either[String, RdfTerm])): Seq[Binding] =
      triples.flatMap { case (s, p, o) =>
        def unify(slot: Either[String, RdfTerm], v: RdfTerm, acc: Option[Binding]): Option[Binding] =
          acc.flatMap { m =>
            slot match {
              case Right(t) => if (t == v) Some(m) else None
              case Left(name) => m.get(name) match {
                case Some(bound) => if (bound == v) Some(m) else None
                case None => Some(m + (name -> v))
              }
            }
          }
        unify(tp._3, o, unify(tp._2, p, unify(tp._1, s, Some(b))))
      }
    patterns.foldLeft(Seq(Map.empty: Binding))((acc, tp) => acc.flatMap(matchOne(_, tp)))
  }

  /** Naive OPTIONAL: left-join semantics with compatibility. */
  private def naiveOptional(left: Seq[Binding], right: Seq[Binding]): Seq[Binding] =
    left.flatMap { l =>
      val compatible = right.filter(r => r.forall { case (k, v) => l.get(k).forall(_ == v) })
      if (compatible.isEmpty) Seq(l) else compatible.map(l ++ _)
    }

  private def randomCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val nodes = (0 until 6).map(i => Iri(s"urn:n$i"))
    val preds = (0 until 3).map(i => Iri(s"urn:p$i"))
    val lits = Seq(Lit.simple("a"), Lit.simple("b"))
    def term(): RdfTerm =
      if (rnd.nextInt(5) == 0) lits(rnd.nextInt(lits.size)) else nodes(rnd.nextInt(nodes.size))
    val triples = Seq.fill(14 + rnd.nextInt(12))(
      (nodes(rnd.nextInt(nodes.size)): RdfTerm, preds(rnd.nextInt(preds.size)): RdfTerm, term()))
      .distinct
    val quads = Turtle.quadsToDF(spark,
      triples.map(t => RdfQuad(None, t._1, t._2.asInstanceOf[Iri], t._3)))

    // random pattern: 2-3 triple patterns over vars x,y,z + constants
    val vars = Seq("x", "y", "z")
    def slot(): Either[String, RdfTerm] =
      if (rnd.nextInt(3) == 0) Right(
        if (rnd.nextBoolean()) nodes(rnd.nextInt(nodes.size)) else preds(rnd.nextInt(preds.size)))
      else Left(vars(rnd.nextInt(vars.size)))
    def pat() = (slot(), {
      val p = slot(); p match { case Right(_: Iri) => p; case Right(_) => Left("y"); case _ => p }
    }, slot())
    val base = Seq.fill(2 + rnd.nextInt(2))(pat())
    val opt = Seq(pat())

    def slotStr(s: Either[String, RdfTerm]): String = s match {
      case Left(v) => s"?$v"
      case Right(t) => t.toString
    }
    def bgpStr(ps: Seq[(Either[String, RdfTerm], Either[String, RdfTerm], Either[String, RdfTerm])]) =
      ps.map(tp => s"${slotStr(tp._1)} ${slotStr(tp._2)} ${slotStr(tp._3)} .").mkString(" ")
    val q = s"SELECT ?x ?y ?z WHERE { ${bgpStr(base)} OPTIONAL { ${bgpStr(opt)} } }"

    // engine result as a bag of (x, y, z) strings
    val got = Graft(quads).select(q).collect().toSeq.map { r =>
      vars.map { v =>
        val i = r.fieldIndex(v)
        if (r.isNullAt(i)) "∅" else {
          val st = r.getStruct(i)
          st.getByte(0) + "|" + st.getString(1)
        }
      }.mkString(" ")
    }.sorted

    // naive result
    val leftB = naiveBgp(triples, base)
    val optB = naiveBgp(triples, opt)
    val expect = naiveOptional(leftB, optB).map { m =>
      vars.map(v => m.get(v).map {
        case Iri(x) => s"0|$x"
        case BNode(x) => s"1|$x"
        case Lit(x, _, _) => s"2|$x"
      }.getOrElse("∅")).mkString(" ")
    }.sorted

    assert(got == expect,
      s"seed=$seed\nquery=$q\ntriples=${triples.mkString("; ")}\ngot=$got\nexpect=$expect")
  }

  test("engine matches naive evaluator on 20 random BGP+OPTIONAL cases") {
    (1 to 20).foreach(randomCase)
  }

  private def randomUnionCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val nodes = (0 until 5).map(i => Iri(s"urn:n$i"))
    val preds = (0 until 3).map(i => Iri(s"urn:p$i"))
    val triples = Seq.fill(12 + rnd.nextInt(10))(
      (nodes(rnd.nextInt(nodes.size)): RdfTerm, preds(rnd.nextInt(preds.size)): RdfTerm,
        nodes(rnd.nextInt(nodes.size)): RdfTerm)).distinct
    val quads = Turtle.quadsToDF(spark,
      triples.map(t => RdfQuad(None, t._1, t._2.asInstanceOf[Iri], t._3)))
    val vars = Seq("x", "y")
    def slot(): Either[String, RdfTerm] =
      if (rnd.nextInt(3) == 0) Right(nodes(rnd.nextInt(nodes.size)))
      else Left(vars(rnd.nextInt(vars.size)))
    def pat() = (slot(), Right(preds(rnd.nextInt(preds.size))): Either[String, RdfTerm], slot())
    val bA = Seq.fill(1 + rnd.nextInt(2))(pat())
    val bB = Seq.fill(1 + rnd.nextInt(2))(pat())
    def slotStr(sl: Either[String, RdfTerm]): String =
      sl.fold("?" + _, _.toString)
    def bgpStr(ps: Seq[(Either[String, RdfTerm], Either[String, RdfTerm], Either[String, RdfTerm])]) =
      ps.map(tp => s"${slotStr(tp._1)} ${slotStr(tp._2)} ${slotStr(tp._3)} .").mkString(" ")
    val q = s"SELECT ?x ?y WHERE { { ${bgpStr(bA)} } UNION { ${bgpStr(bB)} } }"

    val got = Graft(quads).select(q).collect().toSeq.map { r =>
      vars.map { v =>
        val i = r.fieldIndex(v)
        if (r.isNullAt(i)) "∅" else r.getStruct(i).getString(1)
      }.mkString(" ")
    }.sorted
    val expect = (naiveBgp(triples, bA) ++ naiveBgp(triples, bB)).map { m =>
      vars.map(v => m.get(v).map { case Iri(x) => x; case o => o.toString }
        .getOrElse("∅")).mkString(" ")
    }.sorted
    assert(got == expect, s"seed=$seed\nquery=$q\ngot=$got\nexpect=$expect")
  }

  test("engine matches naive evaluator on 15 random UNION cases") {
    (100 to 114).foreach(randomUnionCase)
  }

  /** SPARQL MINUS: drop l iff some r is compatible AND shares ≥1 bound var. */
  private def naiveMinus(left: Seq[Binding], right: Seq[Binding]): Seq[Binding] =
    left.filterNot { l =>
      right.exists { r =>
        val shared = l.keySet & r.keySet
        shared.nonEmpty && shared.forall(k => l(k) == r(k))
      }
    }

  private def randomMinusCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val nodes = (0 until 5).map(i => Iri(s"urn:n$i"))
    val preds = (0 until 3).map(i => Iri(s"urn:p$i"))
    val triples = Seq.fill(12 + rnd.nextInt(10))(
      (nodes(rnd.nextInt(nodes.size)): RdfTerm, preds(rnd.nextInt(preds.size)): RdfTerm,
        nodes(rnd.nextInt(nodes.size)): RdfTerm)).distinct
    val quads = Turtle.quadsToDF(spark,
      triples.map(t => RdfQuad(None, t._1, t._2.asInstanceOf[Iri], t._3)))
    // left vars x,y; right uses x (shared) and z (unshared) to hit both the
    // shared-domain rule and the disjoint-domain no-op rule
    val rightVars = Seq(Seq("x", "z"), Seq("z", "w"), Seq("x", "y"))(rnd.nextInt(3))
    def slot(vs: Seq[String]): Either[String, RdfTerm] =
      if (rnd.nextInt(4) == 0) Right(nodes(rnd.nextInt(nodes.size)))
      else Left(vs(rnd.nextInt(vs.size)))
    def pat(vs: Seq[String]) =
      (slot(vs), Right(preds(rnd.nextInt(preds.size))): Either[String, RdfTerm], slot(vs))
    val bL = Seq.fill(1 + rnd.nextInt(2))(pat(Seq("x", "y")))
    val bR = Seq.fill(1 + rnd.nextInt(2))(pat(rightVars))
    def slotStr(sl: Either[String, RdfTerm]): String = sl.fold("?" + _, _.toString)
    def bgpStr(ps: Seq[(Either[String, RdfTerm], Either[String, RdfTerm], Either[String, RdfTerm])]) =
      ps.map(tp => s"${slotStr(tp._1)} ${slotStr(tp._2)} ${slotStr(tp._3)} .").mkString(" ")
    val q = s"SELECT ?x ?y WHERE { ${bgpStr(bL)} MINUS { ${bgpStr(bR)} } }"

    val got = Graft(quads).select(q).collect().toSeq.map { r =>
      Seq("x", "y").map { v =>
        val i = r.fieldIndex(v)
        if (r.isNullAt(i)) "∅" else r.getStruct(i).getString(1)
      }.mkString(" ")
    }.sorted
    val expect = naiveMinus(naiveBgp(triples, bL), naiveBgp(triples, bR)).map { m =>
      Seq("x", "y").map(v => m.get(v).map { case Iri(x) => x; case o => o.toString }
        .getOrElse("∅")).mkString(" ")
    }.sorted
    assert(got == expect, s"seed=$seed\nquery=$q\ngot=$got\nexpect=$expect")
  }

  test("engine matches naive evaluator on 15 random MINUS cases") {
    (200 to 214).foreach(randomMinusCase)
  }

  private def randomGraphCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val nodes = (0 until 4).map(i => Iri(s"urn:n$i"))
    val preds = (0 until 2).map(i => Iri(s"urn:p$i"))
    val graphs = Seq(None, Some(Iri("urn:g1")), Some(Iri("urn:g2")))
    val quadsList = Seq.fill(14 + rnd.nextInt(8))(
      (graphs(rnd.nextInt(graphs.size)),
        nodes(rnd.nextInt(nodes.size)): RdfTerm,
        preds(rnd.nextInt(preds.size)),
        nodes(rnd.nextInt(nodes.size)): RdfTerm)).distinct
    val quads = Turtle.quadsToDF(spark,
      quadsList.map(q => RdfQuad(q._1, q._2, q._3, q._4)))

    // GRAPH ?g { ?x <p> ?y } joined with a default-graph pattern on ?x
    val p0 = preds(rnd.nextInt(preds.size))
    val p1 = preds(rnd.nextInt(preds.size))
    val q = s"""SELECT ?g ?x ?y WHERE {
      GRAPH ?g { ?x ${p0} ?y }
      ?x ${p1} ?z
    }"""
    val got = Graft(quads).select(q).collect().toSeq.map { r =>
      Seq("g", "x", "y").map { v =>
        val i = r.fieldIndex(v)
        if (r.isNullAt(i)) "∅" else r.getStruct(i).getString(1)
      }.mkString(" ")
    }.sorted
    // naive: named-graph matches of p0 × default-graph matches of p1 on x
    val expect = (for {
      (g, x, p, y) <- quadsList if g.isDefined && p == p0
      (g2, x2, p2, _) <- quadsList if g2.isEmpty && p2 == p1 && x2 == x
    } yield Seq(g.get.value, x.asInstanceOf[Iri].value, y.asInstanceOf[Iri].value).mkString(" "))
      .sorted
    assert(got == expect, s"seed=$seed\nquery=$q\ngot=$got\nexpect=$expect")
  }

  test("engine matches naive evaluator on 15 random GRAPH-scope cases") {
    (300 to 314).foreach(randomGraphCase)
  }

  /** EXISTS / NOT EXISTS over an explicit Join — guards the
    * pushWholeExists rewrite (round 4): correlation vars landing on one
    * side, spanning both sides (BGP split-cover reassociation), and fully
    * uncorrelated patterns must all agree with substitution semantics. */
  private def randomExistsCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val nodes = (0 until 5).map(i => Iri(s"urn:n$i"))
    val preds = (0 until 3).map(i => Iri(s"urn:p$i"))
    val triples = Seq.fill(12 + rnd.nextInt(10))(
      (nodes(rnd.nextInt(nodes.size)): RdfTerm, preds(rnd.nextInt(preds.size)): RdfTerm,
        nodes(rnd.nextInt(nodes.size)): RdfTerm)).distinct
    val quads = Turtle.quadsToDF(spark,
      triples.map(t => RdfQuad(None, t._1, t._2.asInstanceOf[Iri], t._3)))
    def slot(vs: Seq[String]): Either[String, RdfTerm] =
      if (rnd.nextInt(4) == 0) Right(nodes(rnd.nextInt(nodes.size)))
      else Left(vs(rnd.nextInt(vs.size)))
    def pat(vs: Seq[String]) =
      (slot(vs), Right(preds(rnd.nextInt(preds.size))): Either[String, RdfTerm], slot(vs))
    def slotStr(sl: Either[String, RdfTerm]): String = sl.fold("?" + _, _.toString)
    def bgpStr(ps: Seq[(Either[String, RdfTerm], Either[String, RdfTerm], Either[String, RdfTerm])]) =
      ps.map(tp => s"${slotStr(tp._1)} ${slotStr(tp._2)} ${slotStr(tp._3)} .").mkString(" ")
    val bL1 = Seq.fill(1 + rnd.nextInt(2))(pat(Seq("x", "y")))
    val bL2 = Seq.fill(1 + rnd.nextInt(2))(pat(Seq("y", "z")))
    // one-side / both-sides / uncorrelated / same-side correlation shapes
    val exVars = Seq(Seq("x", "w"), Seq("x", "z"), Seq("w", "v"), Seq("x", "y"))(rnd.nextInt(4))
    val bE = Seq.fill(1 + rnd.nextInt(2))(pat(exVars))
    val neg = rnd.nextBoolean()
    val q = s"SELECT ?x ?y ?z WHERE { { ${bgpStr(bL1)} } { ${bgpStr(bL2)} } " +
      s"FILTER ${if (neg) "NOT " else ""}EXISTS { ${bgpStr(bE)} } }"

    val got = Graft(quads).select(q).collect().toSeq.map { r =>
      Seq("x", "y", "z").map { v =>
        val i = r.fieldIndex(v)
        if (r.isNullAt(i)) "∅" else r.getStruct(i).getString(1)
      }.mkString(" ")
    }.sorted
    val left = naiveBgp(triples, bL1 ++ bL2)
    val ex = naiveBgp(triples, bE)
    val expect = left.filter { l =>
      val holds = ex.exists { r =>
        val shared = l.keySet & r.keySet
        shared.forall(k => l(k) == r(k))
      }
      if (neg) !holds else holds
    }.map { m =>
      Seq("x", "y", "z").map(v => m.get(v).map { case Iri(x) => x; case o => o.toString }
        .getOrElse("∅")).mkString(" ")
    }.sorted
    assert(got == expect, s"seed=$seed\nquery=$q\ngot=$got\nexpect=$expect")
  }

  test("engine matches naive evaluator on 20 random EXISTS-over-join cases") {
    (400 to 419).foreach(randomExistsCase)
  }
}
