package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused A/B bench for the r5→r6 regression investigation (VERDICT r5 §Performance).
  *
  * Replicates Bench.scala's session setup exactly, but:
  *   - runs only the queries named in SPARK_GRAFT_QUERIES (comma-separated;
  *     default = the 9 queries the r5 judge flagged as regressed vs r4),
  *   - makes the r5-added prefix-Jaccard JIT warmup toggleable
  *     (SPARK_GRAFT_WARM_JACCARD=0|1, default 1 — matching Bench), likewise
  *     the windfarm prebuild (SPARK_GRAFT_WARM_WINDFARM, default 0: none of
  *     the suspect queries touch the windfarm store),
  *   - runs SPARK_GRAFT_ROUNDS full passes (default 3) and prints every
  *     sample, so drift across rounds (JIT, caches, memory pressure) is
  *     visible rather than folded into a min.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val warmJaccard = sys.env.getOrElse("SPARK_GRAFT_WARM_JACCARD", "1") == "1"
    val warmWindfarm = sys.env.getOrElse("SPARK_GRAFT_WARM_WINDFARM", "0") == "1"
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "ann_cosine,ann_cosine_batch,ann_ivf,ann_ivf_batch,ann_lsh,ann_lsh_batch," +
      "sparql_string_funcs,sparql_sample,sparql_region_nations").split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => }
    if (warmJaccard) try {
      import spark.implicits._
      val tiny = (0 until 40).map(i => (i.toLong,
        s"warm doc $i " + (0 until 25).map(j => s"w${(i + j) % 30}").mkString(" ")))
        .toDF("doc_id", "text")
      graft.ops.Dedup.jaccardPairsPrefix(tiny, "doc_id", "text", 0.6, 3)
        .write.format("noop").mode("overwrite").save()
      System.err.println("[ab] jaccard warmup: done")
    } catch { case e: Throwable => System.err.println(s"[ab] jit warmup: $e") }
    if (warmWindfarm) {
      try graft.SparkEntry.queries("windfarm_production")(spark, sfDir).limit(1).collect()
      catch { case e: Throwable => System.err.println(s"[ab] windfarm prebuild: $e") }
    }
    for (r <- 1 to rounds) {
      val line = names.map { name =>
        val fn = graft.SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[ab] $name: $e") }
        f"$name=${(System.nanoTime() - t0) / 1e9}%.3f"
      }.mkString(" ")
      println(s"round $r: $line")
    }
    spark.stop()
  }
}
