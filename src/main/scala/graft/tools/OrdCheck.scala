package graft.tools
import org.apache.spark.sql.SparkSession
/** Plan probe: ORDER BY + LIMIT over a DYNAMIC-kind variable must still plan
  * TakeOrderedAndProject (map-side k-merge, no full sort) now that the
  * sortable-view ladder is materialised as a projected column before the
  * Sort (see Rewriter.orderDf). Run: sbt "runMain graft.tools.OrdCheck". */
object OrdCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = (1 to 50).flatMap(i =>
      graft.sources.NTriples.parseLine(s"""<http://e/s$i> <http://e/p> "v$i" ."""))
    val quads = graft.sources.Turtle.quadsToDF(spark, rows)
    val g = graft.engine.Graft(quads)
    val df = g.select("SELECT ?s ?o WHERE { ?s <http://e/p> ?o } ORDER BY DESC(?o) ?s LIMIT 5")
    df.explain("formatted")
  }
}
