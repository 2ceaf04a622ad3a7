package graft.tools
import org.apache.spark.sql.SparkSession
object StrFuncsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // interleaved A/B: string funcs vs a control query of similar shape
    for (i <- 1 to 4) {
      for (q <- Seq("sparql_string_funcs", "sparql_filter_order")) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
        println(f"[strfn] $q%-22s#$i ${(System.nanoTime()-t0)/1e9}%5.2f s")
      }
    }
    spark.stop()
  }
}
