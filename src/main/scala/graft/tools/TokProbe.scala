package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Micro-profile of tokenisation/shingle formulations on the gate corpus. */
object TokProbe {
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
        println(f"[tok] $name%-40s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    def tokArr = filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    def shingleTrans(ts: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), size(ts) - 3), i => concat_ws(" ", slice(ts, i + 1, lit(3))))

    time("tokArray only") {
      df.select(col("doc_id"), tokArr.as("ts"))
    }
    time("shingle transform (pre-bound ts)") {
      df.select(col("doc_id"), tokArr.as("ts"))
        .where(size(col("ts")) >= 3)
        .select(col("doc_id"), shingleTrans(col("ts")).as("arr"))
    }
    time("old: explode + global distinct") {
      df.select(col("doc_id"), tokArr.as("ts"))
        .where(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(shingleTrans(col("ts"))).as("shingle"))
        .distinct()
    }
    time("new: docSets bound-ts explode") {
      graft.ops.Dedup.shingles(df, "doc_id", "text", 3)
    }
    time("array_distinct pre-bound ts") {
      df.select(col("doc_id"), tokArr.as("ts"))
        .where(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(array_distinct(shingleTrans(col("ts")))).as("shingle"))
    }
    time("new minus array_distinct") {
      df.select(col("doc_id"), tokArr.as("ts"))
        .where(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(shingleTrans(col("ts"))).as("shingle"))
    }
    spark.stop()
  }
}
