package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Graft
import graft.gen.WindFarmGen

/** Times the two heavy same-subject stars of the wind-farm BGP in isolation,
  * fused vs unfused, to locate where the per-query seconds go: the ts star
  * (16 groups × ~100k-element collect_list — giant skewed lists) vs the dp
  * star (1.6M groups × 2-element lists). */
object WfStarProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files.createTempDirectory("graft_wfstar").toString
    graft.QuadStore(WindFarmGen.quads(spark, n)).save(path)
    val quads = graft.QuadStore.load(spark, path).quads
    println(s"[wfs] quads=${quads.count()}")

    val pre = """PREFIX ct:<https://github.com/magbak/chrontext#>
      |PREFIX rdfs:<http://www.w3.org/2000/01/rdf-schema#>
      |""".stripMargin
    val shapes = Seq(
      "ts_star  (16 subj x 100k)" ->
        "SELECT ?ts ?dp WHERE { ?ts rdfs:label \"Production\" . ?ts ct:hasDataPoint ?dp }",
      "dp_star  (1.6M subj x 1+1)" ->
        "SELECT ?dp ?v ?t WHERE { ?dp ct:hasValue ?v . ?dp ct:hasTimestamp ?t }",
      "ts+dp    (chained)" ->
        """SELECT ?ts ?v ?t WHERE { ?ts rdfs:label "Production" . ?ts ct:hasDataPoint ?dp .
          |  ?dp ct:hasValue ?v . ?dp ct:hasTimestamp ?t }""".stripMargin)
    for ((name, q) <- shapes; mode <- Seq("fused", "plain"); run <- 1 to 2) {
      val g = if (mode == "fused") Graft(quads) else Graft.unfused(quads)
      val t0 = System.nanoTime()
      g.select(pre + q).write.format("noop").mode("overwrite").save()
      println(f"[wfs] $name%-28s $mode%-6s run$run ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
