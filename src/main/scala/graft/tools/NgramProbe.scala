package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TextAnalysis

/** A/B the ngramStats top-k shapes: single per-group window vs two-phase
  * salted selection. Run: sbt "runMain graft.tools.NgramProbe [sfDir]" */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint()
    println(s"[ngram] docs=${docs.count()}")

    def counts(): DataFrame = {
      val ws = TextAnalysis.normTokens(col("text"))
      val grams = when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1), i => array_join(slice(ws, i, lit(2)), " ")))
        .otherwise(array().cast("array<string>"))
      docs.select(col("source").as("grp"), explode(grams).as("ngram"))
        .groupBy("grp", "ngram").agg(count(lit(1)).as("cnt"))
    }
    def time(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = mk.write.format("noop").mode("overwrite").save()
      println(f"[ngram] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def countsMat(): DataFrame = {
      // materialize the token array BEFORE the per-index lambda so the
      // regex split runs once per doc, not once per bigram index
      val toks = docs.select(col("source").as("grp"),
        TextAnalysis.normTokens(col("text")).as("ws"))
      val grams = when(size(col("ws")) >= 2,
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => array_join(slice(col("ws"), i, lit(2)), " ")))
        .otherwise(array().cast("array<string>"))
      toks.select(col("grp"), explode(grams).as("ngram"))
        .groupBy("grp", "ngram").agg(count(lit(1)).as("cnt"))
    }
    val order = Seq(col("cnt").desc, col("ngram").asc)
    for (round <- 1 to 3) {
      time(s"counts_only r$round")(counts())
      time(s"counts_mat r$round")(countsMat())
      time(s"single_window r$round") {
        val w = Window.partitionBy("grp").orderBy(order: _*)
        counts().withColumn("__rn", row_number().over(w)).where(col("__rn") <= 5)
      }
      time(s"two_phase r$round") {
        val wP = Window.partitionBy(col("grp"), pmod(hash(col("ngram")), lit(64))).orderBy(order: _*)
        val w = Window.partitionBy("grp").orderBy(order: _*)
        counts().withColumn("__rp", row_number().over(wP)).where(col("__rp") <= 5)
          .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 5)
      }
    }
    spark.stop()
  }
}
