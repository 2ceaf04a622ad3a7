package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity
object BatchAnnProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(100000)
    val nQ = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs: DataFrame = spark.range(nVecs).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)),
        i => ((conv(substring(md5(concat(col("id").cast("string"), lit("|"), i)), 1, 6), 16, 10)
          .cast("double") / 16777215.0) * 2 - 1).cast("float")).as("embedding")).localCheckpoint()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[bann] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.1f s rows $n")
    }
    // force index build outside timings
    time("index_build(1q)") { Similarity.ivfTopK(vecs, "vec_id", "embedding", 0L, 10, 32, 4).count() }
    val queries = spark.range(nQ).select((col("id") * 97 % nVecs).as("vec_id"))
    // piece 1: raw cross scoring volume — queries x corpus dot products, count only
    val q = vecs.join(queries.select(col("vec_id").as("__qid")), col("vec_id") === col("__qid"))
      .select(col("__qid"), col("embedding").as("__qv")).localCheckpoint()
    // kept as the negative result: an element_at-unrolled dot is ~7× SLOWER
    // than the zip_with/aggregate fold (100k×500: 61.5 s vs 8.5 s) — and on
    // float arrays not even bit-identical (float adds vs double accumulator)
    def dotUnrolled(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, dims: Int) =
      (1 to dims).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)
    time("brute_dot_unrolled") {
      vecs.crossJoin(broadcast(q))
        .select(dotUnrolled(col("embedding"), col("__qv"), 32).as("d"))
        .filter(col("d") > 2.0).count() // consumes every dot, selects none
    }
    time("brute_dot_zipwith") {
      vecs.crossJoin(broadcast(q))
        .select(Similarity.dot(col("embedding"), col("__qv")).as("d"))
        .filter(col("d") > 2.0).count()
    }
    time("brute_dot_window") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("__qid").orderBy(col("d").desc)
      vecs.crossJoin(broadcast(q))
        .select(col("__qid"), col("vec_id"), Similarity.dot(col("embedding"), col("__qv")).as("d"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10).count()
    }
    time("ivfTopKAll") {
      Similarity.ivfTopKAll(vecs, "vec_id", "embedding", queries, "vec_id", 10, 32, 4).count()
    }
    spark.stop()
  }
}
