package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.engine.Graft
import graft.gen.BsbmGen

/** Times each BSBM Explore/BI benchmark query over the generated dataset.
  * Usage: runMain graft.tools.BsbmProbe [nProducts] */
object BsbmProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.expression.nestedPruning.enabled", "false")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val quads = if (sys.env.get("BSBM_STORE").contains("rdd"))
      BsbmGen.quads(spark, n).repartition(32).localCheckpoint()
    else if (sys.env.get("BSBM_STORE").contains("range")) {
      val path = java.nio.file.Files.createTempDirectory("graft_bsbm").toString
      graft.QuadStore(BsbmGen.quads(spark, n)).save(path)
      graft.QuadStore.load(spark, path).quads
    } else {
      val path = java.nio.file.Files.createTempDirectory("graft_bsbm").toString
      graft.QuadStore(BsbmGen.quads(spark, n)).saveByPredicate(path)
      graft.QuadStore.load(spark, path).quads
    }
    println(f"[bsbm] generate n=$n: ${quads.count()} quads in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // BSBM_THETA=1 uses the pre-r5 theta compat path; BSBM_REPS repeats each
    // query (fresh plan each rep) to separate plan-time from steady-state
    val g = if (sys.env.get("BSBM_THETA").contains("1")) Graft.thetaCompat(quads)
            else Graft(quads)
    val reps = sys.env.getOrElse("BSBM_REPS", "1").toInt
    val qdir = Paths.get("/root/reference/bench/tests/query_results/queries")
    val names = Files.list(qdir).iterator().asScala.map(_.getFileName.toString)
      .filter(f => f.startsWith("explore-") || f.startsWith("bi-"))
      .map(_.stripSuffix(".sparql")).toSeq.sorted
      .filter(q => args.drop(1).isEmpty || args.drop(1).contains(q))
    names.foreach { q =>
      val text = new String(Files.readAllBytes(qdir.resolve(s"$q.sparql")), "UTF-8")
      for (_ <- 1 to reps) {
        val t1 = System.nanoTime()
        val rows = g.query(text).collect().length
        println(f"[bsbm] $q%-32s ${(System.nanoTime() - t1) / 1e9}%6.1f s rows $rows")
      }
    }
  }
}
