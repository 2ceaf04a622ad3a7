package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.Turtle

/**
 * Randomised UPDATE differential: random small quad stores × random update
 * requests (INSERT DATA / DELETE DATA / DELETE WHERE / DELETE-INSERT-WHERE
 * with WITH / GRAPH blocks / CLEAR / ADD / COPY / MOVE), applied both by
 * the engine (`QuadStore.update`) and by a naive driver-side set-semantics
 * model of the SPARQL 1.1 Update spec. Complements the curated UpdateSpec /
 * W3C-slice update tests with unbiased op sequences. Seeds fixed.
 */
class RandomUpdateDifferentialSpec extends SparkSpec {

  private type Quad = (Option[String], String, String, RdfTerm) // graph IRI, s, p, o
  private val graphs = Seq(None, Some("urn:g1"), Some("urn:g2"))
  private val nodes = (0 until 4).map(i => s"urn:n$i")
  private val preds = (0 until 3).map(i => s"urn:p$i")
  private val objs: Seq[RdfTerm] =
    nodes.map(Iri(_)) ++ Seq(Lit.integer(1), Lit.integer(2), Lit.simple("x"))

  private def randomStore(rnd: scala.util.Random): Set[Quad] =
    (0 until (4 + rnd.nextInt(10))).map { _ =>
      (graphs(rnd.nextInt(graphs.size)), nodes(rnd.nextInt(nodes.size)),
        preds(rnd.nextInt(preds.size)), objs(rnd.nextInt(objs.size)))
    }.toSet

  private def renderTerm(t: RdfTerm): String = t match {
    case Iri(v) => s"<$v>"
    case Lit(v, dt, None) if dt == Xsd.integer => v
    case Lit(v, _, None) => "\"" + v + "\""
    case other => other.toString
  }
  private def renderQuad(q: Quad): String = {
    val t = s"<${q._2}> <${q._3}> ${renderTerm(q._4)}"
    q._1.fold(s"$t .")(g => s"GRAPH <$g> { $t }")
  }

  /** One random op as (update text, naive model transition). */
  private def randomOp(rnd: scala.util.Random,
                       state: Set[Quad]): (String, Set[Quad] => Set[Quad]) = {
    def someQuads(): Seq[Quad] = {
      val fromStore = rnd.shuffle(state.toSeq).take(rnd.nextInt(3))
      val fresh = (0 until rnd.nextInt(3)).map { _ =>
        (graphs(rnd.nextInt(graphs.size)), nodes(rnd.nextInt(nodes.size)),
          preds(rnd.nextInt(preds.size)), objs(rnd.nextInt(objs.size)))
      }
      fromStore ++ fresh
    }
    rnd.nextInt(6) match {
      case 0 =>
        val qs = someQuads()
        (s"INSERT DATA { ${qs.map(renderQuad).mkString(" ")} }", st => st ++ qs)
      case 1 =>
        val qs = someQuads()
        (s"DELETE DATA { ${qs.map(renderQuad).mkString(" ")} }", st => st -- qs)
      case 2 =>
        // DELETE WHERE { ?s <p> ?o } in default or a named graph
        val p = preds(rnd.nextInt(preds.size))
        val g = graphs(rnd.nextInt(graphs.size))
        val pat = g.fold(s"?s <$p> ?o .")(gi => s"GRAPH <$gi> { ?s <$p> ?o }")
        (s"DELETE WHERE { $pat }",
          st => st.filterNot(q => q._1 == g && q._3 == p))
      case 3 =>
        // rename predicate pa -> pb within one graph scope (WITH for named)
        val pa = preds(rnd.nextInt(preds.size))
        val pb = preds(rnd.nextInt(preds.size))
        val g = graphs(rnd.nextInt(graphs.size))
        val withClause = g.fold("")(gi => s"WITH <$gi> ")
        (s"${withClause}DELETE { ?s <$pa> ?o } INSERT { ?s <$pb> ?o } WHERE { ?s <$pa> ?o }",
          st => {
            val moved = st.filter(q => q._1 == g && q._3 == pa)
            st -- moved ++ moved.map(q => (q._1, q._2, pb, q._4))
          })
      case 4 =>
        val g = Some("urn:g" + (1 + rnd.nextInt(2)))
        (s"CLEAR GRAPH <${g.get}>", st => st.filterNot(_._1 == g)) // graph exists? SILENT below
      case _ =>
        // ADD / COPY / MOVE between default and a named graph
        val kind = Seq("ADD", "COPY", "MOVE")(rnd.nextInt(3))
        val from = graphs(rnd.nextInt(graphs.size))
        val to = graphs(rnd.nextInt(graphs.size))
        def ref(x: Option[String]) = x.fold("DEFAULT")(g => s"<$g>")
        (s"$kind SILENT ${ref(from)} TO ${ref(to)}",
          st =>
            if (from == to) st
            else {
              val src = st.filter(_._1 == from).map(q => (to, q._2, q._3, q._4))
              kind match {
                case "ADD" => st ++ src
                case "COPY" => st.filterNot(_._1 == to) ++ src
                case "MOVE" => st.filterNot(q => q._1 == to || q._1 == from) ++ src
              }
            })
    }
  }

  private def actualQuads(st: QuadStore): Set[Quad] =
    st.quads.collect().toSet.map { (r: org.apache.spark.sql.Row) =>
      def term(i: Int): RdfTerm = {
        val s = r.getStruct(i)
        s.getByte(0) match {
          case 0 => Iri(s.getString(1))
          case 1 => BNode(s.getString(1))
          case _ => Lit(s.getString(1),
            Option(s.getString(2)).getOrElse(
              if (s.getString(3) != null) Rdf.langString else Xsd.string),
            Option(s.getString(3)))
        }
      }
      (Option(r.getStruct(0)).map(_.getString(1)),
        term(1).asInstanceOf[Iri].value, term(2).asInstanceOf[Iri].value, term(3))
    }

  private def runCase(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    var model = randomStore(rnd)
    var store = QuadStore(Turtle.quadsToDF(spark,
      model.toSeq.map(q => RdfQuad(q._1.map(Iri(_)), Iri(q._2), Iri(q._3), q._4))))
    val ops = Seq.newBuilder[String]
    // CLEAR GRAPH on a maybe-missing graph must be SILENT to stay total
    for (_ <- 0 until 4) {
      val (text0, step) = randomOp(rnd, model)
      val text = if (text0.startsWith("CLEAR GRAPH")) "CLEAR SILENT" + text0.drop(5) else text0
      ops += text
      store = store.update(text)
      model = step(model)
      // canonicalize integers: the engine keeps the inserted lexical; the
      // model inserts "1"/"2" only, and the store generator does too, so
      // lexical forms agree — compare exact
      val actual = actualQuads(store)
      assert(actual == model,
        s"""seed=$seed after ops:
           |${ops.result().mkString("\n")}
           |missing=${(model -- actual).take(5)}
           |extra=${(actual -- model).take(5)}""".stripMargin)
    }
  }

  (1 to 30).foreach { seed =>
    test(s"random update request ≡ naive set-semantics model (seed $seed)") {
      runCase(seed)
    }
  }
}
