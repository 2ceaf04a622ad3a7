package graft.tools

import org.apache.spark.sql.SparkSession
import graft.QuadStore
import graft.sources.Turtle
import graft.model._

/**
 * Plan-growth probe for multi-op UPDATE requests (cited from
 * UpdateExec.apply's lineage-cut comment): builds a random 100-op request
 * and times `update()` + a terminal count with the lineage cut at its
 * default (8), disabled (cutEvery=1000000), and aggressive (2). Without
 * cuts each op nests another anti-join/union over the previous state, so
 * Catalyst analysis time grows superlinearly in request length; with the
 * every-8-ops localCheckpoint the compile cost per op stays ~flat.
 *
 * Run: sbt --error "runMain graft.tools.UpdatePlanProbe [nOps]"
 */
object UpdatePlanProbe {
  def main(args: Array[String]): Unit = {
    val nOps = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new scala.util.Random(7)
    def iri(p: String) = s"urn:upp:$p${rnd.nextInt(40)}"
    def op(): String = rnd.nextInt(4) match {
      case 0 => s"INSERT DATA { <${iri("s")}> <${iri("p")}> <${iri("o")}> }"
      case 1 => s"DELETE DATA { <${iri("s")}> <${iri("p")}> <${iri("o")}> }"
      case 2 => s"DELETE WHERE { ?s <${iri("p")}> ?o }"
      case _ => s"DELETE { ?s <${iri("p")}> ?o } INSERT { ?s <${iri("q")}> ?o } WHERE { ?s <${iri("p")}> ?o }"
    }
    val req = Seq.fill(nOps)(op()).mkString(" ;\n")
    val base = (0 until 2000).map(i =>
      RdfQuad(None, Iri(s"urn:upp:s${i % 40}"), Iri(s"urn:upp:p${i % 40}"),
        Iri(s"urn:upp:o${i % 40}")))

    for (cut <- Seq("2", "8", "1000000")) {
      sys.props("graft.update.cutEvery") = cut
      val store = QuadStore(Turtle.quadsToDF(spark, base))
      val t0 = System.nanoTime()
      val updated = store.update(req)
      val tPlan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = updated.quads.count()
      val tRun = (System.nanoTime() - t1) / 1e9
      println(f"[upp] nOps=$nOps cutEvery=$cut%-8s fold=${tPlan}%7.2f s  count=${tRun}%7.2f s  ($n quads)")
    }
    spark.stop()
  }
}
