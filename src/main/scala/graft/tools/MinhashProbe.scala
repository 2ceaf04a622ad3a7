package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage-by-stage timing of the MinHash-LSH pipeline, old vs new shapes. */
object MinhashProbe {
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
        println(f"[mh] $name%-42s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    def pHash(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
    def affine(hm: Column, seed: Int): Column = {
      val a = (1103515245L * (seed + 1)) % 2147483629L
      val b = (12345L * (seed + 1)) % 2147483647L
      (hm * a + b) % 2147483647L
    }
    def tokArr = filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    def shingleTrans(ts: Column) =
      transform(sequence(lit(0), size(ts) - 3), i => concat_ws(" ", slice(ts, i + 1, lit(3))))
    def oldSets = df.select(col("doc_id").as("id"), tokArr.as("ts"))
      .where(size(col("ts")) >= 3)
      .select(col("id"), explode(shingleTrans(col("ts"))).as("tok")).distinct()
    def newSets = graft.ops.Dedup.docSets(df, "doc_id", "text", 3)
      .select(col("id"), explode(col("arr")).as("tok"))

    def sigsOf(sets: DataFrame): DataFrame = {
      val withBase = sets.withColumn("hm", pHash(col("tok")) % 1073741789L)
      val mins = (0 until 32).map(i => min(affine(col("hm"), i)).as(s"h$i"))
      withBase.groupBy("id").agg(mins.head, mins.tail: _*)
        .select(col("id"), array((0 until 32).map(i => col(s"h$i")): _*).as("sig"))
    }

    time("old sets (explode+distinct)") { oldSets }
    time("new sets (docSets explode)") { newSets }
    time("old sigs") { sigsOf(oldSets) }
    time("new sigs") { sigsOf(newSets) }
    time("full pairs (current impl)") {
      graft.ops.Dedup.minhashLshPairs(df, "doc_id", "text", 32, 8, 0.3, 3)
    }
    spark.stop()
  }
}
