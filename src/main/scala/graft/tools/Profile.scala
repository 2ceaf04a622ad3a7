package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.RdbToRdf
import graft.engine.Graft

/** Scratch profiler: times sub-shapes of a hot query to localise per-row
  * cost (noop sink = consume every column). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val m = RdbToRdf.mapping(spark, dir, Seq("lineitem"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    time("raw groupBy sum") {
      li.groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    }
    time("star scan materialize") {
      m.starScan(Seq("urn:g:lineitem#l_returnflag", "urn:g:lineitem#l_extendedprice",
        "urn:g:lineitem#l_discount")).get._1
    }
    time("star scan no subject") {
      m.starScan(Seq("urn:g:lineitem#l_returnflag", "urn:g:lineitem#l_extendedprice",
        "urn:g:lineitem#l_discount")).get._1.drop("subject")
    }
    time("engine full bind_sum") {
      Graft(m.quads, m).select(
        """SELECT ?flag (SUM(?rev) AS ?revenue) WHERE {
          |  ?l <urn:g:lineitem#l_returnflag> ?flag .
          |  ?l <urn:g:lineitem#l_extendedprice> ?p .
          |  ?l <urn:g:lineitem#l_discount> ?d .
          |  BIND(?p * (1 - ?d) AS ?rev)
          |} GROUP BY ?flag ORDER BY ?flag""".stripMargin)
    }
    time("engine no BIND sum ?p") {
      Graft(m.quads, m).select(
        """SELECT ?flag (SUM(?p) AS ?revenue) WHERE {
          |  ?l <urn:g:lineitem#l_returnflag> ?flag .
          |  ?l <urn:g:lineitem#l_extendedprice> ?p .
          |} GROUP BY ?flag ORDER BY ?flag""".stripMargin)
    }
    time("bind only, no agg") {
      Graft(m.quads, m).select(
        """SELECT ?flag ?rev WHERE {
          |  ?l <urn:g:lineitem#l_returnflag> ?flag .
          |  ?l <urn:g:lineitem#l_extendedprice> ?p .
          |  ?l <urn:g:lineitem#l_discount> ?d .
          |  BIND(?p * (1 - ?d) AS ?rev)
          |}""".stripMargin)
    }
    locally {
      val df = Graft(m.quads, m).select(
        """SELECT ?flag ?rev WHERE {
          |  ?l <urn:g:lineitem#l_returnflag> ?flag .
          |  ?l <urn:g:lineitem#l_extendedprice> ?p .
          |  ?l <urn:g:lineitem#l_discount> ?d .
          |  BIND(?p * (1 - ?d) AS ?rev)
          |}""".stripMargin)
      val s = df.queryExecution.optimizedPlan.toString
      println(s"[profile] bind-only optimized plan chars: ${s.length}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/bindplan.txt"), s)
    }
    time("bind simple ?p*2, sum") {
      Graft(m.quads, m).select(
        """SELECT ?flag (SUM(?rev) AS ?revenue) WHERE {
          |  ?l <urn:g:lineitem#l_returnflag> ?flag .
          |  ?l <urn:g:lineitem#l_extendedprice> ?p .
          |  BIND(?p * 2 AS ?rev)
          |} GROUP BY ?flag""".stripMargin)
    }
    time("bind nested, count agg") {
      Graft(m.quads, m).select(
        """SELECT ?flag (COUNT(?rev) AS ?revenue) WHERE {
          |  ?l <urn:g:lineitem#l_returnflag> ?flag .
          |  ?l <urn:g:lineitem#l_extendedprice> ?p .
          |  ?l <urn:g:lineitem#l_discount> ?d .
          |  BIND(?p * (1 - ?d) AS ?rev)
          |} GROUP BY ?flag""".stripMargin)
    }
    time("engine count only") {
      Graft(m.quads, m).select(
        """SELECT ?flag (COUNT(?l) AS ?n) WHERE {
          |  ?l <urn:g:lineitem#l_returnflag> ?flag .
          |} GROUP BY ?flag""".stripMargin)
    }
    spark.stop()
  }
}
