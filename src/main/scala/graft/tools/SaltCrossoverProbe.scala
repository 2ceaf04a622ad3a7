package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Salting payoff curve vs corpus size (r6 verdict item 6): times the
  * MinHash-LSH pair pipeline with salting FORCED ON vs GATED OFF over
  * synthetic near-dup-rich corpora of increasing size (same generator as
  * OpsScaleProbe, so hot shingle buckets exist at every scale). The
  * crossover — where the detection job + widened keys stop being a tax and
  * start paying — calibrates the default `graft.salt.minRows` gate. */
object SaltCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(50000, 200000, 800000)
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

    def run(docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.5, shingleK = 3)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { n =>
      val docs = corpus(n)
      docs.count()
      // warm both paths, then min of 2 per config, interleaved
      sys.props("graft.salt.minRows") = "1"; run(docs)
      sys.props("graft.salt.minRows") = Long.MaxValue.toString; run(docs)
      val on = (1 to 2).map { _ => sys.props("graft.salt.minRows") = "1"; run(docs) }.min
      val off = (1 to 2).map { _ =>
        sys.props("graft.salt.minRows") = Long.MaxValue.toString; run(docs) }.min
      println(f"[salt-x] n=$n%8d  salt_on=$on%7.2f s  gated_off=$off%7.2f s  on/off=${on / off}%5.2f")
      sys.props.remove("graft.salt.minRows")
    }
    spark.stop()
  }
}
