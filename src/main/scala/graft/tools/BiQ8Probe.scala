package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.engine.Graft

/** Splits BI-Q8's ~6.6 s fresh-plan cost into build / optimize+codegen /
  * execute (r6: ParityBench showed min-of-2 at 19.9 s vs the 7.8 s r4 band). */
object BiQ8Probe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files.createTempDirectory("graft_biq8").toString
    graft.QuadStore(graft.gen.BsbmGen.quads(spark, n)).saveByPredicate(path)
    val g = Graft(graft.QuadStore.load(spark, path).quads)
    val text = new String(Files.readAllBytes(
      Paths.get("/root/reference/bench/tests/query_results/queries/bi-q8.sparql")), "UTF-8")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = g.query(text)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+physical planning
      val t2 = System.nanoTime()
      val rows = df.collect().length
      val t3 = System.nanoTime()
      println(f"[biq8] rep $i build ${(t1-t0)/1e9}%5.2f s optimize ${(t2-t1)/1e9}%5.2f s execute ${(t3-t2)/1e9}%5.2f s rows $rows")
    }
    val df = g.query(text)
    println(s"[biq8] optimized plan size: ${df.queryExecution.optimizedPlan.toString.length} chars")
    spark.stop()
  }
}
