package graft.tools
import org.apache.spark.sql.SparkSession
object WfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // force the store build first
    t("build+first_prod") { graft.SparkEntry.queries("windfarm_production")(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save() }
    for (i <- 1 to 3; q <- Seq("windfarm_grouped_multi", "windfarm_grouped_prod")) {
      t(s"$q#$i") { graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
