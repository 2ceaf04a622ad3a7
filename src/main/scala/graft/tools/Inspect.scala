package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Plan/timing inspector for driver-contract queries.
 *
 * Usage:
 *   sbt "runMain graft.tools.Inspect <queryName> [sfDir] [--explain|--time|--show]"
 *
 * --explain prints the formatted physical plan (check ReadSchema column
 * pruning, PushedFilters, join strategies, WholeStageCodegen spans);
 * --time runs 3 timed executions to the noop sink; --show displays rows.
 */
object Inspect {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      println("queries: " + graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      return
    }
    val sfDir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.01")
    val mode = args.find(_.startsWith("--")).getOrElse("--explain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    mode match {
      case "--time" =>
        spark.range(1000000).selectExpr("sum(id)").collect() // warmup
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[inspect] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case "--show" => fn(spark, sfDir).show(50, truncate = false)
      case _ => fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
