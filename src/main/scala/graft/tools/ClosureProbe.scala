package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-timing probe for sparql_path_closure / sparql_path_seeded:
  * separates BGP+decode cost from the closure build (the bench's cold-pass
  * dominator after the r10 cache-honesty fix: 12.0 s cold vs 2.0 s warm).
  * Run:  graftrun.sh graft.tools.ClosureProbe /root/testdata/sf0.1
  */
object ClosureProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the session like Bench does
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    for (pass <- 1 to 3) {
      graft.ops.IndexCache.clearAll()
      println(s"=== pass $pass (cold artifacts)")
      time("path_closure full")(
        graft.SparkEntry.queries("sparql_path_closure")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("path_closure again (warm cache)")(
        graft.SparkEntry.queries("sparql_path_closure")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("path_seeded (closure warm)")(
        graft.SparkEntry.queries("sparql_path_seeded")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      graft.ops.IndexCache.clearAll()
      time("path_seeded (cold)")(
        graft.SparkEntry.queries("sparql_path_seeded")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
