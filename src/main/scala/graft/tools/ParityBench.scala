package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.engine.Graft

/** Standing per-round parity artifact: times the REFERENCE'S OWN query texts
  * (`/root/reference/bench/tests/query_results/queries/` — BSBM Explore + BI
  * and the Wind Farm suite) over our generated datasets and prints ONE JSON
  * line, criterion-style (interleaved passes, min per query — same
  * decorrelation rationale as Bench.scala). Saved as `PARITY_r{N}.json` so
  * reference-workload drift has a recorded time series; the r5 bench
  * regression scare was visible only where gate queries happened to overlap.
  *
  * Usage: runMain graft.tools.ParityBench [bsbmProducts] [wfTurbines]
  * (defaults 1000 / 16 — the scales BASELINE.md's parity bands record). */
object ParityBench {
  def main(args: Array[String]): Unit = {
    val nBsbm = args.headOption.map(_.toInt).getOrElse(1000)
    val nWf = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qdir = Paths.get("/root/reference/bench/tests/query_results/queries")

    // one-time store builds (untimed, as in Bench's windfarm prebuild)
    var t0 = System.nanoTime()
    val bsbmPath = Files.createTempDirectory("graft_parity_bsbm").toString
    graft.QuadStore(graft.gen.BsbmGen.quads(spark, nBsbm)).saveByPredicate(bsbmPath)
    val bsbm = Graft(graft.QuadStore.load(spark, bsbmPath).quads)
    System.err.println(f"[parity] bsbm store n=$nBsbm: ${(System.nanoTime() - t0) / 1e9}%.1f s (untimed)")
    t0 = System.nanoTime()
    val wfPath = Files.createTempDirectory("graft_parity_wf").toString
    graft.QuadStore(graft.gen.WindFarmGen.quads(spark, nWf)).save(wfPath)
    val wfKinds = graft.engine.StarSource.kindsOnly(
      Map("https://github.com/magbak/chrontext#hasTimestamp" -> 4))
    val wf = Graft(graft.QuadStore.load(spark, wfPath).quads, wfKinds)
    System.err.println(f"[parity] wind-farm store n=$nWf: ${(System.nanoTime() - t0) / 1e9}%.1f s (untimed)")

    val bsbmNames = Files.list(qdir).iterator().asScala.map(_.getFileName.toString)
      .filter(f => f.startsWith("explore-") || f.startsWith("bi-"))
      .map(_.stripSuffix(".sparql")).toSeq.sorted
    val wfNames = Seq(
      "wind-farm-production-query1", "wind-farm-production-query2",
      "wind-farm-production-query3", "wind-farm-production-query4",
      "wind-farm-grouped-production-query1", "wind-farm-grouped-production-query2",
      "wind-farm-grouped-production-query3", "wind-farm-grouped-production-query4")
    val work: Seq[(String, Graft)] = bsbmNames.map(_ -> bsbm) ++ wfNames.map(_ -> wf)

    // Same host-speed fingerprint as Bench.calibrate(): a trivial
    // code-independent probe, min across passes — so a parity number from a
    // different host normalizes against the recorded calibration instead of
    // reading as a code regression (the r8 fresh-host run measured 2.0x the
    // r7 wall-clock with an unchanged engine; calibration explained it).
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calibrations = scala.collection.mutable.ArrayBuffer[Double]()
    val passes = (1 to 2).map { _ =>
      calibrations += calibrate()
      work.map { case (q, g) =>
        val text = new String(Files.readAllBytes(qdir.resolve(s"$q.sparql")), "UTF-8")
        val t1 = System.nanoTime()
        try g.query(text).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[parity] $q: $e") }
        val dt = (System.nanoTime() - t1) / 1e9
        System.err.println(f"[parity] $q: $dt%.2f s")
        q -> dt
      }
    }
    val results = work.map { case (q, _) => q -> passes.map(_.toMap.apply(q)).min }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val calMin = calibrations.min
    val calAll = calibrations.mkString("[", ",", "]")
    println(s"""{"metric":"parity_total","value":$total,"unit":"sec","n_queries":${results.size},"bsbm_products":$nBsbm,"wf_turbines":$nWf,"calibration":$calMin,"calibration_all":$calAll,"queries":$qs}""")
    spark.stop()
  }
}
