package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.engine.Graft
import graft.gen.BsbmGen

/** Phase-level timing for one BSBM query: build (parse+rewrite), analyze,
  * optimize, execute — locates whether a slow query burns driver planning
  * time or execution time. Usage: runMain graft.tools.BsbmDebug <query> */
object BsbmDebug {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("bi-q3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.expression.nestedPruning.enabled", "false")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }
    val quads = t("generate")(BsbmGen.quads(spark, 1000).repartition(32).localCheckpoint())
    val g = Graft(quads)
    val text = new String(Files.readAllBytes(
      Paths.get(s"/root/reference/bench/tests/query_results/queries/$name.sparql")), "UTF-8")
    val df = t("build")(g.query(text))
    t("analyzed")(df.queryExecution.analyzed)
    val opt = t("optimize")(df.queryExecution.optimizedPlan)
    println(s"[dbg] optimized plan size: ${opt.toString.length} chars, " +
      s"${opt.collect { case p => p }.size} nodes")
    opt.foreach { node =>
      val s = node.simpleString(50)
      println(f"[dbg] node ${node.nodeName}%-24s ${node.toString.length - node.children.map(_.toString.length).sum}%9d chars own | ${s.take(120)}")
    }
    Files.write(Paths.get("/tmp/biq3_plan.txt"), opt.toString.getBytes("UTF-8"))
    t("execute")(df.collect().length match { case n => println(s"[dbg] rows $n") })
    t("execute2")(df.collect())
  }
}
