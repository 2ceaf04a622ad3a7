package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of the SkewSalt pay-as-you-go gate (r6 verdict
  * item 1): runs the dedup-family gate queries alternating salting FORCED ON
  * (graft.salt.minRows=1) vs GATED OFF (minRows=Long.Max), in one session so
  * JIT/host state is shared, and prints min-per-config. The index caches are
  * keyed by corpus plan + params only — both configs share the signature
  * builds, so the measured delta is exactly the detection job + salt-widened
  * shuffle key that the gate removes. */
object SaltGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("dedup_minhash", "dedup_simhash", "emb_near_dup",
      "dedup_clusters", "dedup_keep")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both code paths once (JIT + signature caches)
    names.foreach { n =>
      sys.props("graft.salt.minRows") = "1"; run(n)
      sys.props("graft.salt.minRows") = Long.MaxValue.toString; run(n)
    }
    val samples = collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 3; n <- names; cfg <- Seq("on", "off")) {
      sys.props("graft.salt.minRows") =
        if (cfg == "on") "1" else Long.MaxValue.toString
      samples((n, cfg)) = run(n) :: samples((n, cfg))
    }
    sys.props.remove("graft.salt.minRows")
    for (n <- names) {
      val on = samples((n, "on")).min
      val off = samples((n, "off")).min
      println(f"$n%-16s salt_on=$on%.3f  gated_off=$off%.3f  ratio=${on / off}%.2fx")
    }
    spark.stop()
  }
}
