package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Similarity

/** Stage-level diagnosis of ivfTopKAll: where do the minutes go. Inlines the
  * pipeline so each piece can be forced and timed separately. */
object BatchAnnDiag {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(50000)
    val nQ = args.lift(1).map(_.toInt).getOrElse(200)
    val nClusters = 32; val nProbe = 4; val k = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vecs: DataFrame = spark.range(nVecs).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)),
        i => ((conv(substring(md5(concat(col("id").cast("string"), lit("|"), i)), 1, 6), 16, 10)
          .cast("double") / 16777215.0) * 2 - 1).cast("float")).as("embedding")).localCheckpoint()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[diag] $name%-26s ${(System.nanoTime()-t0)/1e9}%7.1f s rows $n")
    }
    // replicate the index build (same as ivfCached)
    val (cents, idx0) = Similarity.ivfIndex(vecs, "vec_id", "embedding", nClusters)
    val indexed = idx0.withColumn("nrm", Similarity.norm(col("vr"))).localCheckpoint()
    val cLit = typedlit(cents.map(_.toSeq).toSeq)
    val memberDist = sqrt(aggregate(
      zip_with(col("v"), element_at(cLit, col("cluster") + 1), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x))
    val radii = indexed.groupBy("cluster").agg(max(memberDist).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val queries = spark.range(nQ).select((col("id") * 97 % nVecs).as("vec_id"))
    val centDf = cents.indices.map(i => (i, cents(i).toSeq, radii.getOrElse(i, 0.0)))
      .toDF("cluster", "cvec", "radius")
    val qv = indexed.join(queries.select(col("vec_id").cast(LongType).as("__qid")),
        col("vec_id") === col("__qid"))
      .select(col("__qid"), col("vr").as("__qraw"), col("v").as("__qhat"), col("nrm").as("__qnrm"))
    val qc = qv.crossJoin(broadcast(centDf))
      .withColumn("__qdist", sqrt(aggregate(
        zip_with(col("__qhat"), col("cvec"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x)))
      .drop("cvec", "__qhat")
    def candCos = Similarity.dot(col("vr"), col("__qraw")) / (col("nrm") * col("__qnrm"))
    def candCosOld = Similarity.cosine(col("vr"), col("__qraw"))
    val ranked = qc.withColumn("__crank",
      row_number().over(Window.partitionBy("__qid").orderBy(col("__qdist"), col("cluster"))))
    val probe1 = ranked.filter(col("__crank") <= nProbe)
      .select(col("__qid"), col("cluster"), col("__qraw"), col("__qnrm"))
    time("probe1_count") { probe1.count() }
    val cands1 = broadcast(probe1).join(indexed, Seq("cluster")).filter(col("vec_id") =!= col("__qid"))
    time("phase1_dots_new") { cands1.select(candCos.as("c")).filter(col("c") > 2).count() }
    time("phase1_dots_old") { cands1.select(candCosOld.as("c")).filter(col("c") > 2).count() }
    val wCos = Window.partitionBy("__qid").orderBy(col("__c").desc)
    val bounds = cands1
      .select(col("__qid"), candCos.as("__c"))
      .withColumn("__rn", row_number().over(wCos))
      .filter(col("__rn") === k)
      .select(col("__qid"),
        (sqrt(greatest(lit(0.0d), lit(2.0d) - lit(2.0d) * col("__c"))) + lit(1e-9)).as("__dk"))
    time("bounds_count") { bounds.count() }
    val probeAll = ranked.join(bounds, Seq("__qid"), "left")
      .filter(col("__crank") <= nProbe || col("__dk").isNull ||
        (col("__qdist") - col("radius")) <= col("__dk"))
      .select(col("__qid"), col("cluster"), col("__qraw"), col("__qnrm"))
    time("probeAll_count") { probeAll.count() }
    val candsAll = broadcast(probeAll).join(indexed, Seq("cluster")).filter(col("vec_id") =!= col("__qid"))
    time("final_dots_only") { candsAll.select(candCos.as("c")).filter(col("c") > 2).count() }
    val wClus = Window.partitionBy("__qid", "cluster").orderBy(col("sim").desc, col("vec_id").asc)
    val wTop = Window.partitionBy("__qid").orderBy(col("sim").desc, col("vec_id").asc)
    val scored = candsAll
      .select(col("__qid"), col("cluster"), col("vec_id"), round(candCos, 6).as("sim"))
    time("final_hier_windows") {
      scored.withColumn("__rc", row_number().over(wClus)).filter(col("__rc") <= k)
        .withColumn("__rn", row_number().over(wTop)).filter(col("__rn") <= k).count()
    }
    time("final_single_window") {
      scored.drop("cluster")
        .withColumn("__rn", row_number().over(wTop)).filter(col("__rn") <= k).count()
    }
    spark.stop()
  }
}
