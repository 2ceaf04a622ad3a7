package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.sources.RdbToRdf.tpchQuads(spark, "/root/testdata/sf0.001", Seq("customer","orders"))
    val df = graft.engine.Graft(q).select(
      "SELECT ?name WHERE { ?c <urn:g:customer#c_name> ?name . ?c <urn:g:customer#c_acctbal> ?bal . FILTER(?bal > 9000) }")
    df.explain("formatted")
  }
}
