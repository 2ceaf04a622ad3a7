package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-3 scratch profiler: splits each slow bench query into
  * plan-construction time (parse + rewrite + checkpoint) vs execution time,
  * to localise whether the cost is planning overhead or data movement. */
object Round3Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val names = Seq("dedup_simhash", "ann_ivf", "dedup_jaccard",
      "dedup_minhash", "emb_near_dup", "sparql_date_funcs")
    for (n <- names; run <- 1 to 2) {
      val t0 = System.nanoTime()
      val df: DataFrame = graft.SparkEntry.queries(n)(spark, dir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[r3] $n%-22s run$run  build=${(t1 - t0) / 1e9}%6.2f s  exec=${(t2 - t1) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
