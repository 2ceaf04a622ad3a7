package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.BsbmGen

object BsbmDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val quads = BsbmGen.quads(spark, 1000).localCheckpoint()
    println("[bsbm] total quads = " + quads.count())
    val subjects = quads.select(col("subject").getField("v").as("s")).distinct()
    val needed = Seq(
      "dataFromProducer6/Producer6", "dataFromProducer6/Product272",
      "dataFromProducer7/Product296", "dataFromProducer12/Product578",
      "dataFromProducer13/Product636", "dataFromProducer14/Product637",
      "dataFromProducer17/Product801", "dataFromProducer19/Product890",
      "dataFromVendor1/Offer1250", "dataFromVendor5/Offer9035",
      "dataFromRatingSite1/Review4194",
      "ProductType1", "ProductType4", "ProductType48", "ProductType56",
      "ProductType85", "ProductType111", "ProductType141",
      "ProductFeature8", "ProductFeature24", "ProductFeature1453",
      "ProductFeature1645", "ProductFeature2594", "ProductFeature4393")
    needed.foreach { n =>
      val c = subjects.where(col("s") === (BsbmGen.Inst + n)).count()
      if (c == 0) println(s"[bsbm] MISSING: $n")
    }
    println("[bsbm] done")
  }
}
