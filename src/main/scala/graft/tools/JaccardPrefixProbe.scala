package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage timing for the plan-C prefix-filtered Jaccard pipeline
  * (round-5 profiling, VERDICT r4 item 5). */
object JaccardPrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    // warm run end-to-end, then stages
    time("whole op (warm1)")(graft.ops.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 0.6, 3).count())
    time("whole op (warm2)")(graft.ops.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 0.6, 3).count())
    val base = time("base checkpoint")(graft.ops.Dedup.docSets(docs, "doc_id", "text", 3).localCheckpoint())
    val sets = graft.ops.Dedup.explodeArr(base, "tok")
    time("sets count (explode from ckpt)")(sets.count())
    val tokDf = sets.groupBy("tok").agg(count(lit(1)).as("df"))
    time("tokDf")(tokDf.count())
    val ordered = sets.join(tokDf, Seq("tok")).groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"), count(lit(1)).as("sz"))
    time("ordered agg")(ordered.count())
    spark.stop()
  }
}
