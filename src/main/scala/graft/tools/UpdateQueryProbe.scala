package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the sparql_update / sparql_update_graphs bench queries
  * (driver-bound per the r9 scaling block: 8c/32c ratio ≈ 1). */
object UpdateQueryProbe {
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
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 3) {
      println(s"=== pass $i")
      time("sparql_update full")(
        graft.SparkEntry.queries("sparql_update")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("sparql_update_graphs full")(
        graft.SparkEntry.queries("sparql_update_graphs")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      // phase split for sparql_update
      val st0 = time("  tpchQuads store")(
        graft.QuadStore(graft.sources.RdbToRdf.tpchQuads(spark, sfDir, Seq("supplier"))))
      val st1 = time("  update (4 ops)")(st0.update("""
        DELETE { ?s <urn:g:supplier#s_acctbal> ?b }
        INSERT { GRAPH <urn:tiers> { ?s <urn:tier> ?tier } }
        WHERE  { ?s <urn:g:supplier#s_acctbal> ?b .
                 BIND(IF(?b >= 5000e0, "high", "low") AS ?tier) } ;
        INSERT DATA { GRAPH <urn:tiers> { <urn:audit> <urn:tier> "audit" } } ;
        DELETE DATA { GRAPH <urn:tiers> { <urn:audit> <urn:tier> "audit" } }"""))
      val res = time("  select")(st1.select("""
        SELECT ?tier (COUNT(?x) AS ?n) (COUNT(?bal) AS ?remaining) WHERE {
          GRAPH <urn:tiers> { ?x <urn:tier> ?tier }
          OPTIONAL { ?x <urn:g:supplier#s_acctbal> ?bal }
        } GROUP BY ?tier ORDER BY ?tier"""))
      val dec = graft.engine.Graft.decode(res,
          Map("n" -> org.apache.spark.sql.types.LongType,
              "remaining" -> org.apache.spark.sql.types.LongType))
        .orderBy("tier")
      time("  analyze+optimize+plan")(dec.queryExecution.executedPlan)
      time("  execute (noop)")(dec.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
