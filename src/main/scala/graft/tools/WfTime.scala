package graft.tools
import org.apache.spark.sql.SparkSession
/** Split windfarm_grouped_multi cost into plan-build / optimize / execute. */
object WfTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // untimed store build
    graft.SparkEntry.queries("windfarm_production")(spark, dir).limit(1).collect()
    for (q <- Seq("windfarm_production", "windfarm_grouped_prod", "windfarm_grouped_multi");
         i <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis+optimize+planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"$q%-26s run$i build=${(t1-t0)/1e9}%5.2f optimize=${(t2-t1)/1e9}%5.2f exec=${(t3-t2)/1e9}%5.2f")
    }
  }
}
