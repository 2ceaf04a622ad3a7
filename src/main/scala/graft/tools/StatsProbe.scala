package graft.tools
import org.apache.spark.sql.SparkSession
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val st = graft.QuadStore(graft.sources.RdbToRdf.tpchQuads(spark, "/root/testdata/sf0.1", Seq("supplier")))
    println("[stats] supplier-mapping store sizeInBytes=" +
      st.quads.queryExecution.optimizedPlan.stats.sizeInBytes)
    spark.stop()
  }
}
