package graft.tools
import org.apache.spark.sql.SparkSession
import graft.engine.Graft
import graft.gen.BsbmGen
object BiQ4Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files.createTempDirectory("graft_biq4").toString
    graft.QuadStore(BsbmGen.quads(spark, 2000)).save(path)
    val quads = graft.QuadStore.load(spark, path).quads
    val g = Graft(quads)
    val bsbm = "http://www4.wiwiss.fu-berlin.de/bizer/bsbm/v01/"
    def time(name: String, q: String, explain: Boolean = false): Unit = {
      if (name == "sumFloatCast") { val d = g.select(q); d.collect();
        java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/sumfloat_plan.txt"), d.queryExecution.executedPlan.toString) }
      val df = g.select(q)
      val t = System.nanoTime(); val n = df.collect().length
      println(f"[biq4b] $name%-16s rows $n%6d  ${(System.nanoTime()-t)/1e9}%6.1f s")
      if (explain) java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/biq4_plan.txt"), df.queryExecution.executedPlan.toString)
    }
    // sub-shapes of withoutFeature, cheapest first
    time("products48", s"""SELECT ?product WHERE {
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> . }""")
    time("featXprod", s"""SELECT ?feature ?product WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
    }""")
    time("featXprodAnti", s"""SELECT ?feature ?product WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      FILTER(NOT EXISTS { ?product <${bsbm}vocabulary/productFeature> ?feature . })
    }""")
    time("offersJoin", s"""SELECT ?product ?price WHERE {
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price . }""")

    time("antiOffers", s"""SELECT ?feature ?price WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
      FILTER(NOT EXISTS { ?product <${bsbm}vocabulary/productFeature> ?feature . })
    }""")
    time("antiOffersAgg", s"""SELECT (COUNT(?price) AS ?n) ?feature WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
      FILTER(NOT EXISTS { ?product <${bsbm}vocabulary/productFeature> ?feature . })
    } GROUP BY ?feature""")
    time("avgNoAnti", s"""SELECT (AVG(<http://www.w3.org/2001/XMLSchema#float>(<http://www.w3.org/2001/XMLSchema#string>(?price))) AS ?avg) ?feature WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
    } GROUP BY ?feature""")

    time("avgPlainNoCast", s"""SELECT (AVG(?price) AS ?avg) ?feature WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
    } GROUP BY ?feature""")
    time("avgStrOnly", s"""SELECT (AVG(<http://www.w3.org/2001/XMLSchema#string>(?price)) AS ?avg) ?feature WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
    } GROUP BY ?feature""")
    time("sumFloatCast", s"""SELECT (SUM(<http://www.w3.org/2001/XMLSchema#float>(<http://www.w3.org/2001/XMLSchema#string>(?price))) AS ?avg) ?feature WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
    } GROUP BY ?feature""")
    time("withoutFeature", s"""SELECT (AVG(<http://www.w3.org/2001/XMLSchema#float>(<http://www.w3.org/2001/XMLSchema#string>(?price))) AS ?avg) ?feature WHERE {
      { SELECT DISTINCT ?feature WHERE {
          ?p <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
          ?p <${bsbm}vocabulary/productFeature> ?feature . } }
      ?product <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${bsbm}instances/ProductType48> .
      ?offer <${bsbm}vocabulary/product> ?product .
      ?offer <${bsbm}vocabulary/price> ?price .
      FILTER(NOT EXISTS { ?product <${bsbm}vocabulary/productFeature> ?feature . })
    } GROUP BY ?feature""", explain = args.contains("--explain"))
  }
}
