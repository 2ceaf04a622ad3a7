package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch check: IVF top-k recall vs exact brute force at both gate SFs. */
object IvfCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val t0 = System.nanoTime()
      val ivf = graft.ops.Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, 16, 4)
        .collect().map(_.getLong(0)).toSeq
      val t1 = System.nanoTime()
      val exact = graft.ops.Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
        .collect().map(_.getLong(0)).toSeq
      println(s"[ivf] $sf recall=${ivf.intersect(exact).size}/10 match=${ivf == exact} t=${(t1 - t0) / 1e9}%.2f".replace("%.2f", f"${(t1 - t0) / 1e9}%.2f"))
    }
    spark.stop()
  }
}
