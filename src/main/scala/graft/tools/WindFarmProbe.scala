package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.engine.Graft
import graft.gen.WindFarmGen

/** Times each Wind Farm benchmark query over the generated dataset.
  * Usage: runMain graft.tools.WindFarmProbe [numTurbines] [--explain q] */
object WindFarmProbe {
  private val qdir = Paths.get("/root/reference/bench/tests/query_results/queries")
  private val names = Seq(
    "production-query1", "production-query2", "production-query3", "production-query4",
    "grouped-production-query1", "grouped-production-query2",
    "grouped-production-query3", "grouped-production-query4")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.filterNot(_.startsWith("--")).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled",
        sys.env.getOrElse("WF_NESTED", "true"))
      .config("spark.sql.optimizer.expression.nestedPruning.enabled",
        sys.env.getOrElse("WF_NESTED", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("WF_BCAST", "10485760"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("WF_BCAST_AQE", sys.env.getOrElse("WF_BCAST", "10485760")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val quads = sys.env.getOrElse("WF_STORE", "parquet") match {
      case "rdd" => WindFarmGen.quads(spark, n).localCheckpoint()
      case "bypred" =>
        val path = java.nio.file.Files.createTempDirectory("graft_wfprobe").toString
        graft.QuadStore(WindFarmGen.quads(spark, n)).saveByPredicate(path)
        graft.QuadStore.load(spark, path).quads
      case _ =>
        val path = java.nio.file.Files.createTempDirectory("graft_wfprobe").toString
        graft.QuadStore(WindFarmGen.quads(spark, n)).save(path)
        graft.QuadStore.load(spark, path).quads
    }
    println(f"[wf] generate n=$n: ${quads.count()} quads in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val kinds = graft.engine.StarSource.kindsOnly(
      Map("https://github.com/magbak/chrontext#hasTimestamp" -> 4))
    val g = if (sys.env.get("WF_FUSE").contains("off")) Graft.unfused(quads)
            else if (sys.env.get("WF_KINDS").contains("off")) Graft(quads)
            else Graft(quads, kinds)
    val explain = args.indexOf("--explain")
    names.foreach { q =>
      val text = new String(Files.readAllBytes(qdir.resolve(s"wind-farm-$q.sparql")), "UTF-8")
      val t1 = System.nanoTime()
      val df = g.select(text)
      val tPlan = (System.nanoTime() - t1) / 1e9
      if (explain >= 0 && args.lift(explain + 1).contains(q)) df.explain("formatted")
      val rows = df.collect().length
      println(f"[wf] $q%-28s plan $tPlan%5.1f s total ${(System.nanoTime() - t1) / 1e9}%5.1f s rows $rows")
    }
  }
}
