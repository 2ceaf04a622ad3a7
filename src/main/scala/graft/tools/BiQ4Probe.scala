package graft.tools
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.engine.Graft
import graft.gen.BsbmGen
object BiQ4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.expression.nestedPruning.enabled", sys.env.getOrElse("BIQ4_NESTED", "false"))
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", sys.env.getOrElse("BIQ4_NESTED", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files.createTempDirectory("graft_biq4").toString
    graft.QuadStore(BsbmGen.quads(spark, 2000)).save(path)
    val quads = graft.QuadStore.load(spark, path).quads
    val g = Graft(quads)
    val bsbm = "http://www4.wiwiss.fu-berlin.de/bizer/bsbm/v01/"
    def time(name: String, q: String): Unit = {
      val t = System.nanoTime(); val n = g.select(q).collect().length
      println(f"[biq4] $name%-14s rows $n%6d  ${(System.nanoTime()-t)/1e9}%6.1f s")
    }
    time("withFeature", s"""SELECT (AVG(<http://www.w3.org/2001/XMLSchema#float>(<http://www.w3.org/2001/XMLSchema#string>(?price))) AS ?avg) ?feature WHERE {
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?product <${bsbm}vocabulary/productFeature> ?feature .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
    } GROUP BY ?feature""")
    time("distinctFeat", s"""SELECT DISTINCT ?feature WHERE {
      ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?p <${bsbm}vocabulary/productFeature> ?feature . }""")
    time("withoutFeature", s"""SELECT (AVG(<http://www.w3.org/2001/XMLSchema#float>(<http://www.w3.org/2001/XMLSchema#string>(?price))) AS ?avg) ?feature WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
      FILTER(NOT EXISTS { ?product <${bsbm}vocabulary/productFeature> ?feature . })
    } GROUP BY ?feature""")
    val text = new String(Files.readAllBytes(
      Paths.get("/root/reference/bench/tests/query_results/queries/bi-q4.sparql")), "UTF-8")
    val df = g.select(text)
    val t = System.nanoTime(); val n = df.collect().length
    println(f"[biq4] full          rows $n%6d  ${(System.nanoTime()-t)/1e9}%6.1f s")
    val fin = df.queryExecution.executedPlan.toString
    println("[biq4] final joins: " + "(\\w*Join\\w*|CartesianProduct)".r
      .findAllIn(fin).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
    println("[biq4] finalPlan? " + fin.contains("isFinalPlan=true"))
  }
}
