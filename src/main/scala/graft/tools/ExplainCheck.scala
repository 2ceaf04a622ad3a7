package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainCheck {
  def time[T](label: String)(f: => T): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[time] $label: ${(System.nanoTime()-t0)/1e9}%.2f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val q = graft.sources.RdbToRdf.tpchQuads(spark, dir, Seq("lineitem"))
    def scan(p: String) = q.filter(col("predicate.v") === s"urn:g:lineitem#$p")
      .select(col("subject"), col("object").as(p))
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warmup
    time("struct-key join x2") {
      scan("l_returnflag").join(scan("l_extendedprice"), "subject")
        .join(scan("l_discount"), "subject")
        .write.format("noop").mode("overwrite").save()
    }
    def scanS(p: String) = q.filter(col("predicate.v") === s"urn:g:lineitem#$p")
      .select(col("subject.v").as("sv"), col("object").as(p))
    time("string-key join x2") {
      scanS("l_returnflag").join(scanS("l_extendedprice"), "sv")
        .join(scanS("l_discount"), "sv")
        .write.format("noop").mode("overwrite").save()
    }
    // raw join on the original key columns for comparison
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def scanN(c: String) = li.select(xxhash64(li.columns.map(col): _*).as("k"), col(c))
    time("native-hash-key join x2") {
      scanN("l_returnflag").join(scanN("l_extendedprice"), "k")
        .join(scanN("l_discount"), "k").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
