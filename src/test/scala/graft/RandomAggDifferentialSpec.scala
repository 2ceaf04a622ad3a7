package graft

import graft.engine.Graft
import graft.model._
import graft.sources.Turtle

/**
 * Randomised aggregation differential: random graphs (with NON-CANONICAL
 * numeric lexical forms — "01" vs "1") × random GROUP BY queries, against a
 * naive driver evaluator. Pins the semantics the DuckDB gate cannot see:
 * grouping is by RDF TERM identity ("01"^^xsd:integer and "1"^^xsd:integer
 * are different group keys even though they compare =), COUNT(?v) skips
 * unbound, SUM adds VALUES across distinct lexical forms, and groups form
 * per exact key tuple. Seeds fixed — reproducible.
 */
class RandomAggDifferentialSpec extends SparkSpec {

  private def randomCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val subs = (0 until 4).map(i => Iri(s"urn:s$i"))
    val keys = Seq(
      Lit("1", Xsd.integer, None), Lit("01", Xsd.integer, None),
      Lit("2", Xsd.integer, None), Lit.simple("a"), Lit.simple("b"))
    val nums = Seq("1", "01", "2", "10", "3")
    // ?s :k <group key term> ; :v <numeric literal>, :v optional
    val triples: Seq[(RdfTerm, Iri, RdfTerm)] =
      subs.flatMap { s =>
        val k = keys(rnd.nextInt(keys.size))
        val vs = Seq.fill(rnd.nextInt(3))(
          Lit(nums(rnd.nextInt(nums.size)), Xsd.integer, None))
        ((s: RdfTerm), Iri("urn:k"), (k: RdfTerm)) +:
          vs.map(v => ((s: RdfTerm), Iri("urn:v"), (v: RdfTerm)))
      }
    val quads = Turtle.quadsToDF(spark, triples.map(t => RdfQuad(None, t._1, t._2, t._3)))

    val q = """SELECT ?k (COUNT(?v) AS ?c) (SUM(?v) AS ?sm) WHERE {
              |  ?s <urn:k> ?k . OPTIONAL { ?s <urn:v> ?v }
              |} GROUP BY ?k""".stripMargin
    val got = Graft(quads).select(q).collect().toSeq.map { r =>
      def cell(name: String): String = {
        val i = r.fieldIndex(name)
        if (r.isNullAt(i)) "∅" else {
          val st = r.getStruct(i)
          st.getString(1) + "^^" + Option(st.getString(2)).getOrElse("")
        }
      }
      Seq("k", "c", "sm").map(cell).mkString(" ")
    }.sorted

    // naive: solutions = (s, k) x optional v; group by EXACT k term
    val kOf = triples.collect { case (s, Iri("urn:k"), k) => s -> k }
    val vOf = triples.collect { case (s, Iri("urn:v"), v: Lit) => s -> v }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val solutions = kOf.flatMap { case (s, k) =>
      vOf.get(s) match {
        case Some(vs) => vs.map(v => (k, Some(v)))
        case None => Seq((k, None))
      }
    }
    val expect = solutions.groupBy(_._1).map { case (k, sols) =>
      val vs = sols.flatMap(_._2)
      val cnt = vs.size
      // SUM over integers stays xsd:integer; an UNBOUND ?v in any solution
      // of the group is an evaluation error that poisons SUM (ListEval,
      // spec §18.5.1) while COUNT(?v) just skips it
      val anyUnbound = sols.exists(_._2.isEmpty)
      val sum =
        if (anyUnbound) "∅"
        else s"${vs.map(v => BigInt(v.lexical.trim)).sum}^^${Xsd.integer}"
      val kStr = k match {
        case Lit(v, dt, None) =>
          v + "^^" + (if (dt == Xsd.string) "" else dt)
        case other => other.toString
      }
      Seq(kStr, s"$cnt^^${Xsd.integer}", sum).mkString(" ")
    }.toSeq.sorted

    assert(got == expect,
      s"seed=$seed\ntriples=${triples.mkString("; ")}\ngot=$got\nexpect=$expect")
  }

  test("engine matches naive evaluator on 20 random GROUP BY term-identity cases") {
    (700 to 719).foreach(randomCase)
  }
}
