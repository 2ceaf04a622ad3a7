package graft

import graft.engine.Graft
import graft.model._
import graft.sources.Turtle

/**
 * Differential for the compat-union join rewrite (Rewriter.compatUnionJoin):
 * joins whose every shared variable is OPTIONAL-introduced (nullable) used to
 * plan a pure-theta BroadcastNestedLoopJoin; they now plan a union of
 * null-pattern equi-join slices. The theta path (Graft.thetaCompat) stays as
 * the semantic reference — random OPTIONAL-chain queries must produce
 * identical bags on both paths, and the rewritten plan on all-matched data
 * must contain no nested-loop or cartesian node.
 */
// 183 s of the measured 1687 s full-suite runtime (r10 timing run):
// excluded from the driver's budgeted `sbt test` gate, still run in the
// builder's own loop (see build.sbt testOptions).
@graft.SlowTest
class RandomOptionalChainDifferentialSpec extends SparkSpec {

  /** Seeds per shape — default 20; set GRAFT_FUZZ_N for a deeper one-off
    * sweep (e.g. GRAFT_FUZZ_N=150 sbt "testOnly *RandomOptionalChain*"). */
  private val N = sys.env.getOrElse("GRAFT_FUZZ_N", "20").toInt

  private def bag(df: org.apache.spark.sql.DataFrame, vars: Seq[String]): Seq[String] =
    df.collect().toSeq.map { r =>
      vars.map { v =>
        val i = r.fieldIndex(v)
        if (r.isNullAt(i)) "∅" else {
          val st = r.getStruct(i)
          st.getByte(0) + "|" + st.getString(1)
        }
      }.mkString(" ")
    }.sorted

  private def randomQuads(rnd: scala.util.Random, nPreds: Int) = {
    val nodes = (0 until 7).map(i => Iri(s"urn:n$i"))
    val preds = (0 until nPreds).map(i => Iri(s"urn:p$i"))
    val triples = Seq.fill(16 + rnd.nextInt(14))(
      (nodes(rnd.nextInt(nodes.size)), preds(rnd.nextInt(preds.size)),
        nodes(rnd.nextInt(nodes.size)))).distinct
    Turtle.quadsToDF(spark, triples.map(t => RdfQuad(None, t._1, t._2, t._3)))
  }

  /** Inner join of two OPTIONAL blocks sharing only the nullable ?x:
    * the no-equi compat shape (nullable on BOTH sides). */
  private def innerChainCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val quads = randomQuads(rnd, 4)
    def p() = s"<urn:p${rnd.nextInt(4)}>"
    val q =
      s"""SELECT ?a ?b ?x WHERE {
         |  { ?a ${p()} ?s . OPTIONAL { ?s ${p()} ?x } }
         |  { ?b ${p()} ?t . OPTIONAL { ?t ${p()} ?x } }
         |}""".stripMargin
    val vars = Seq("a", "b", "x")
    val got = bag(Graft(quads).select(q), vars)
    val ref = bag(Graft.thetaCompat(quads).select(q), vars)
    assert(got == ref, s"seed=$seed\nquery=$q\ngot=$got\nref=$ref")
  }

  /** Chained OPTIONALs: the second left join's shared ?x is nullable on the
    * left, definitely bound on the right — the left-join decomposition
    * (inner matches ∪ anti-keyed unmatched). */
  private def leftChainCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val quads = randomQuads(rnd, 4)
    def p() = s"<urn:p${rnd.nextInt(4)}>"
    val q =
      s"""SELECT ?a ?x ?y WHERE {
         |  ?a ${p()} ?s . OPTIONAL { ?s ${p()} ?x } OPTIONAL { ?x ${p()} ?y }
         |}""".stripMargin
    val vars = Seq("a", "x", "y")
    val got = bag(Graft(quads).select(q), vars)
    val ref = bag(Graft.thetaCompat(quads).select(q), vars)
    assert(got == ref, s"seed=$seed\nquery=$q\ngot=$got\nref=$ref")
  }

  /** FILTER inside the OPTIONAL referencing an outer var — the filter rides
    * inside the join condition, so unmatched-by-filter rows must null-pad. */
  private def filteredChainCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val quads = randomQuads(rnd, 3)
    def p() = s"<urn:p${rnd.nextInt(3)}>"
    val q =
      s"""SELECT ?a ?x ?y WHERE {
         |  ?a ${p()} ?s . OPTIONAL { ?s ${p()} ?x }
         |  OPTIONAL { ?x ${p()} ?y FILTER(?y != ?a) }
         |}""".stripMargin
    val vars = Seq("a", "x", "y")
    val got = bag(Graft(quads).select(q), vars)
    val ref = bag(Graft.thetaCompat(quads).select(q), vars)
    assert(got == ref, s"seed=$seed\nquery=$q\ngot=$got\nref=$ref")
  }

  /** Two nullable shared vars across the join (x from each side's OPTIONAL,
    * y bound-left/nullable-right) — exercises the multi-var pattern split. */
  private def twoVarCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val quads = randomQuads(rnd, 4)
    def p() = s"<urn:p${rnd.nextInt(4)}>"
    val q =
      s"""SELECT ?x ?y WHERE {
         |  { ?a ${p()} ?s . OPTIONAL { ?s ${p()} ?x . ?s ${p()} ?y } }
         |  { ?b ${p()} ?t . OPTIONAL { ?t ${p()} ?x } OPTIONAL { ?t ${p()} ?y } }
         |}""".stripMargin
    val vars = Seq("x", "y")
    val got = bag(Graft(quads).select(q), vars)
    val ref = bag(Graft.thetaCompat(quads).select(q), vars)
    assert(got == ref, s"seed=$seed\nquery=$q\ngot=$got\nref=$ref")
  }

  /** MINUS whose shared var is OPTIONAL-introduced on one or both sides —
    * the anti-flavoured null-pattern rewrite (union of semi-join branches). */
  private def minusNullableCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val quads = randomQuads(rnd, 4)
    def p() = s"<urn:p${rnd.nextInt(4)}>"
    val q =
      if (rnd.nextBoolean())
        s"""SELECT ?a ?x WHERE {
           |  ?a ${p()} ?s . OPTIONAL { ?s ${p()} ?x }
           |  MINUS { ?x ${p()} ?w }
           |}""".stripMargin
      else
        s"""SELECT ?a ?x WHERE {
           |  ?a ${p()} ?s . OPTIONAL { ?s ${p()} ?x }
           |  MINUS { ?b ${p()} ?t . OPTIONAL { ?t ${p()} ?x } . ?b ${p()} ?a }
           |}""".stripMargin
    val vars = Seq("a", "x")
    val got = bag(Graft(quads).select(q), vars)
    val ref = bag(Graft.thetaCompat(quads).select(q), vars)
    assert(got == ref, s"seed=$seed\nquery=$q\ngot=$got\nref=$ref")
  }

  test("compat-union ≡ theta anti join on 20 random nullable-MINUS cases") {
    (400 until 400 + N).foreach(minusNullableCase)
  }

  /** EXISTS / NOT EXISTS whose shared var with the outer pattern is
    * OPTIONAL-introduced — the semi/anti null-pattern rewrite, including the
    * no-bound-both branch where the whole left slice matches iff the body
    * relation is non-empty. */
  private def existsNullableCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val quads = randomQuads(rnd, 4)
    def p() = s"<urn:p${rnd.nextInt(4)}>"
    val neg = if (rnd.nextBoolean()) "NOT " else ""
    val q =
      s"""SELECT ?a ?x WHERE {
         |  ?a ${p()} ?s . OPTIONAL { ?s ${p()} ?x }
         |  FILTER ${neg}EXISTS { ?x ${p()} ?w }
         |}""".stripMargin
    val vars = Seq("a", "x")
    val got = bag(Graft(quads).select(q), vars)
    val ref = bag(Graft.thetaCompat(quads).select(q), vars)
    assert(got == ref, s"seed=$seed\nquery=$q\ngot=$got\nref=$ref")
  }

  test("compat-union ≡ theta semi/anti join on 20 random nullable-EXISTS cases") {
    (500 until 500 + N).foreach(existsNullableCase)
  }

  test("compat-union ≡ theta join on 20 random inner OPTIONAL-chain cases") {
    (1 to N).foreach(innerChainCase)
  }
  test("compat-union ≡ theta join on 20 random chained-OPTIONAL left joins") {
    (100 until 100 + N).foreach(leftChainCase)
  }
  test("compat-union ≡ theta join on 15 random filtered OPTIONAL chains") {
    (200 until 200 + math.max(15, N * 3 / 4)).foreach(filteredChainCase)
  }
  test("compat-union ≡ theta join on 15 random two-nullable-var cases") {
    (300 until 300 + math.max(15, N * 3 / 4)).foreach(twoVarCase)
  }

  test("all-matched OPTIONAL chain plans hash joins only — no nested loop, no cartesian") {
    // every ?s has p1 and every ?t has p3 → null slices empty → branches
    // prune to the single bound×bound equi join. Sides sized ABOVE the
    // r6 measured-size gate (Rewriter.CompatUnionMinRows): below it the
    // engine deliberately keeps the theta join (see next test).
    val n = 11000
    val quads = Turtle.quadsToDF(spark, (0 until n).flatMap { i =>
      Seq(
        RdfQuad(None, Iri(s"urn:a$i"), Iri("urn:p0"), Iri(s"urn:s$i")),
        RdfQuad(None, Iri(s"urn:s$i"), Iri("urn:p1"), Iri(s"urn:x${i % 3}")),
        RdfQuad(None, Iri(s"urn:b$i"), Iri("urn:p2"), Iri(s"urn:t$i")),
        RdfQuad(None, Iri(s"urn:t$i"), Iri("urn:p3"), Iri(s"urn:x${i % 4}")))
    })
    val q =
      """SELECT ?a ?b ?x WHERE {
        |  { ?a <urn:p0> ?s . OPTIONAL { ?s <urn:p1> ?x } }
        |  { ?b <urn:p2> ?t . OPTIONAL { ?t <urn:p3> ?x } }
        |}""".stripMargin
    val df = Graft(quads).select(q)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // row-count sanity check: left x = i%3 covers all rows, right x = j%4
    // matches v∈{0,1,2} with exactly n/4 rows each (n % 4 == 0), so the
    // equi join yields Σ_v countL(v)·countR(v) = n · n/4 rows
    assert(df.count() == n.toLong * (n / 4))
  }

  test("measured-small sides keep the theta join (rewrite fixed costs lose below crossover)") {
    // same all-matched shape, 8 rows/side: the r6 size gate routes this to
    // thetaCompatJoin on the checkpointed inputs — a BNLJ over structurally
    // bounded inputs is the faster plan here (tools/CompatUnionProbe)
    val quads = Turtle.quadsToDF(spark, (0 until 8).flatMap { i =>
      Seq(
        RdfQuad(None, Iri(s"urn:a$i"), Iri("urn:p0"), Iri(s"urn:s$i")),
        RdfQuad(None, Iri(s"urn:s$i"), Iri("urn:p1"), Iri(s"urn:x${i % 3}")),
        RdfQuad(None, Iri(s"urn:b$i"), Iri("urn:p2"), Iri(s"urn:t$i")),
        RdfQuad(None, Iri(s"urn:t$i"), Iri("urn:p3"), Iri(s"urn:x${i % 4}")))
    })
    val q =
      """SELECT ?a ?b ?x WHERE {
        |  { ?a <urn:p0> ?s . OPTIONAL { ?s <urn:p1> ?x } }
        |  { ?b <urn:p2> ?t . OPTIONAL { ?t <urn:p3> ?x } }
        |}""".stripMargin
    val df = Graft(quads).select(q)
    // result equivalence is what matters; the plan may legally be a BNLJ
    val vars = Seq("a", "b", "x")
    assert(bag(df, vars) == bag(Graft.thetaCompat(quads).select(q), vars))
  }
}
