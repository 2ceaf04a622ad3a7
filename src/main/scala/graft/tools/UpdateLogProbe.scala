package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{QuadStore, UpdateLog}
import graft.model._
import graft.sources.Turtle

/** End-to-end drive of the write-ahead update log: init from a snapshot,
  * append requests (no base rewrite), merge-on-read load, compact, reload.
  * Run: sbt --error "runMain graft.tools.UpdateLogProbe [dir]" */
object UpdateLogProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_updlog_probe").toString)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = QuadStore(Turtle.quadsToDF(spark, (0 until 1000).map(i =>
      RdfQuad(None, Iri(s"urn:s$i"), Iri("urn:p"), Lit.integer(i.toLong)))))
    UpdateLog.init(base, dir)
    UpdateLog.append(dir, "DELETE { ?s <urn:p> ?o } WHERE { ?s <urn:p> ?o FILTER(?o >= 990) }")
    UpdateLog.append(dir, "INSERT DATA { GRAPH <urn:meta> { <urn:run> <urn:ok> true } }")
    val replayed = UpdateLog.load(spark, dir)
    println(s"[updlog] replayed count=${replayed.quads.count()} graphs=" +
      replayed.namedGraphs().count())
    val compacted = UpdateLog.compact(spark, dir)
    println(s"[updlog] compacted count=${compacted.quads.count()}")
    UpdateLog.append(dir, "DELETE DATA { GRAPH <urn:meta> { <urn:run> <urn:ok> true } }")
    println(s"[updlog] after post-compact append count=${UpdateLog.load(spark, dir).quads.count()}")
    spark.stop()
  }
}
