package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for events_asof_stream: fixture staging vs stream execution
  * (per micro-batch durations from StreamingQueryProgress) vs post-sort. */
object AsofStreamProbe {
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
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 4) {
      time(s"events_asof_stream run $i")(
        graft.SparkEntry.queries("events_asof_stream")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    // manual stream with progress introspection
    import spark.implicits._
    import graft.streaming.EventStreams
    val stage = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_asof_stream_")).head.getAbsolutePath
    val src = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(stage).as[EventStreams.Event]
    for (parts <- Seq(cpus, "8", "4", "2")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val q = EventStreams.asofEnrichStream(src, "click", "view", bufferMs = Long.MaxValue / 4)
        .writeStream.format("memory").queryName(s"probe_q_$parts").outputMode("append").start()
      time(s"processAllAvailable p=$parts")(q.processAllAvailable())
      q.recentProgress.foreach { p =>
        println(s"[probe] p=$parts batch ${p.batchId}: trigger=${p.durationMs.get("triggerExecution")} ms " +
          s"addBatch=${p.durationMs.get("addBatch")} rows=${p.numInputRows}")
      }
      q.stop()
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.stop()
  }
}
