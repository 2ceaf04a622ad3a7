package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolate which plan shape makes the shingle-set derivation slow. */
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$dir/documents.parquet")
    df.count()

    def time(name: String)(mk: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[sh] $name%-46s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    def tokArr = filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    def shingleTrans(ts: Column) =
      transform(sequence(lit(0), size(ts) - 3), i => concat_ws(" ", slice(ts, i + 1, lit(3))))

    time("A: one-proj explode(array_distinct)") {
      df.select(col("doc_id").as("id"), tokArr.as("ts"))
        .where(size(col("ts")) >= 3)
        .select(col("id"), explode(array_distinct(shingleTrans(col("ts")))).as("tok"))
    }
    time("B: two-proj arr then explode") {
      df.select(col("doc_id").as("id"), tokArr.as("ts"))
        .where(size(col("ts")) >= 3)
        .select(col("id"), array_distinct(shingleTrans(col("ts"))).as("arr"))
        .select(col("id"), explode(col("arr")).as("tok"))
    }
    time("C: B + repartition(32) first") {
      df.repartition(32).select(col("doc_id").as("id"), tokArr.as("ts"))
        .where(size(col("ts")) >= 3)
        .select(col("id"), array_distinct(shingleTrans(col("ts"))).as("arr"))
        .select(col("id"), explode(col("arr")).as("tok"))
    }
    time("D: current docSets+explode") {
      graft.ops.Dedup.shingles(df, "doc_id", "text", 3)
    }
    val d = graft.ops.Dedup.shingles(df, "doc_id", "text", 3)
    println(d.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
