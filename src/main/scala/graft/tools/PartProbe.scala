package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.gen.WindFarmGen
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    val t0 = System.nanoTime()
    graft.QuadStore(WindFarmGen.quads(spark, 16)).saveByPredicate(path)
    println(f"[pp] saveByPredicate: ${(System.nanoTime()-t0)/1e9}%.1f s")
    val st = graft.QuadStore.load(spark, path)
    println(s"[pp] count=${st.count()}")
    val scan = st.quadsForPattern(predicate =
      Some(graft.model.Iri("https://github.com/magbak/chrontext#hasValue")))
    val plan = scan.queryExecution.executedPlan.toString
    println("[pp] partition-pruned: " + plan.contains("PartitionFilters: [isnotnull(__pv"))
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("NONE")
    println("[pp] " + pf.take(150))
    println(s"[pp] hasValue rows=${scan.count()}")
    // full query timing through the engine
    val kinds = graft.engine.StarSource.kindsOnly(
      Map("https://github.com/magbak/chrontext#hasTimestamp" -> 4))
    val g = Graft(st.quads, kinds)
    val qdir = java.nio.file.Paths.get("/root/reference/bench/tests/query_results/queries")
    for (q <- Seq("production-query2", "grouped-production-query1"); r <- 1 to 2) {
      val text = new String(java.nio.file.Files.readAllBytes(
        qdir.resolve(s"wind-farm-$q.sparql")), "UTF-8")
      val t1 = System.nanoTime()
      val n = g.select(text).collect().length
      println(f"[pp] $q%-28s run$r ${(System.nanoTime()-t1)/1e9}%5.1f s rows $n")
    }
    spark.stop()
  }
}
