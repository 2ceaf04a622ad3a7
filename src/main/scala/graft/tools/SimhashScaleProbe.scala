package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Focused probe for the r7 simhash candidate-scheme change: times
  * simhashPairs(maxDist=3) — the Manku 6-block/choose-3 keys — over the
  * OpsScaleProbe corpus generator at increasing sizes (the old 4×15-bit
  * single-chunk keys saturated: 216 s at 2M docs). */
object SimhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(200000, 800000, 2000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def corpus(n: Int): DataFrame = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map { w =>
        val base = conv(substring(md5(concat(lit(s"w$w|"), (col("id") / 4).cast("long").cast("string"))), 1, 4), 16, 10) % 500
        val mut = conv(substring(md5(concat(lit(s"m$w|"), col("id").cast("string"))), 1, 4), 16, 10) % 500
        when(col("id") % 4 =!= 0 && lit(w) % 13 === (col("id") % 13), concat(lit("t"), mut))
          .otherwise(concat(lit("t"), base))
      }: _*).as("text")).localCheckpoint()
    sizes.foreach { n =>
      val c = corpus(n)
      c.count()
      val t0 = System.nanoTime()
      val rows = Dedup.simhashPairs(c, "doc_id", "text", maxDist = 3).count()
      println(f"[simhash] n=$n%8d  ${(System.nanoTime() - t0) / 1e9}%7.1f s  pairs=$rows")
    }
    spark.stop()
  }
}
