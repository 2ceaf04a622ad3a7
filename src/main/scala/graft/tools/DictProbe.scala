package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.WindFarmGen

/** Estimates the payoff of ObjectId-style narrow join keys (the reference's
  * lib/encoding object_id: "quadrupled the performance of some queries")
  * before building them into the engine: hand-writes the wind-farm
  * production-query2 join chain over the sorted-parquet quads three ways —
  * (a) joins keyed on full PlainTerm structs (what the Rewriter emits today),
  * (b) joins keyed on xxhash64 of the term fields computed at scan time,
  * (c) joins keyed on the subject/object lexical value string only (valid
  *     here: wf IRIs are distinct by value).
  */
object DictProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files.createTempDirectory("graft_dict").toString
    graft.QuadStore(WindFarmGen.quads(spark, n)).save(path)
    val quads = spark.read.parquet(path)
    println(s"[dp] quads=${quads.count()}")

    val rds = "https://github.com/magbak/chrontext/rds_power#"
    val ct = "https://github.com/magbak/chrontext#"
    val rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def scan(p: String): DataFrame =
      quads.filter(col("predicate.t") === lit(0) && col("predicate.v") === p)
        .select(col("subject"), col("object"))

    // (a) struct keys end-to-end
    def structPlan(): DataFrame = {
      val site = scan(rdf + "type").filter(col("object.v") === rds + "Site").select(col("subject").as("site"))
      val siteLabel = scan(rdfs + "label").select(col("subject").as("site"), col("object").as("site_label"))
      val hasFA = scan(rds + "hasFunctionalAspect")
      val hasFAN = scan(rds + "hasFunctionalAspectNode")
      val aspLabel = scan(rdfs + "label").select(col("subject").as("asp"), col("object").as("wtur_label"))
      val wturA = scan(rdf + "type").filter(col("object.v") === rds + "A").select(col("subject").as("wtur"))
      val gensysRA = scan(rdf + "type").filter(col("object.v") === rds + "RA").select(col("subject").as("gensys"))
      val genGAA = scan(rdf + "type").filter(col("object.v") === rds + "GAA").select(col("subject").as("generator"))
      val hasTs = scan(ct + "hasTimeseries")
      val tsLabel = scan(rdfs + "label").filter(col("object.v") === "Production").select(col("subject").as("ts"))
      val hasDp = scan(ct + "hasDataPoint")
      val hasVal = scan(ct + "hasValue")
      val hasT = scan(ct + "hasTimestamp")

      site
        .join(siteLabel, "site")
        .join(hasFA.select(col("subject").as("site"), col("object").as("wtur_asp")), "site")
        .join(aspLabel.withColumnRenamed("asp", "wtur_asp"), "wtur_asp")
        .join(hasFAN.select(col("subject").as("wtur"), col("object").as("wtur_asp")), "wtur_asp")
        .join(wturA, "wtur")
        .join(hasFA.select(col("subject").as("wtur"), col("object").as("gensys_asp")), "wtur")
        .join(hasFAN.select(col("subject").as("gensys"), col("object").as("gensys_asp")), "gensys_asp")
        .join(gensysRA, "gensys")
        .join(hasFA.select(col("subject").as("gensys"), col("object").as("generator_asp")), "gensys")
        .join(hasFAN.select(col("subject").as("generator"), col("object").as("generator_asp")), "generator_asp")
        .join(genGAA, "generator")
        .join(hasTs.select(col("subject").as("generator"), col("object").as("ts")), "generator")
        .join(tsLabel, "ts")
        .join(hasDp.select(col("subject").as("ts"), col("object").as("dp")), "ts")
        .join(hasVal.select(col("subject").as("dp"), col("object").as("v")), "dp")
        .join(hasT.select(col("subject").as("dp"), col("object").as("t")), "dp")
        .where(col("site_label.v") === "Wind Mountain" &&
          col("wtur_label.v").isin((1 to 10).map("A" + _): _*))
        .select(col("site_label.v").as("sl"), col("wtur_label.v").as("wl"),
          col("t.v").as("t"), col("v.num").as("value"))
        .orderBy("sl", "wl", "t", "value").limit(10)
    }

    // keyed variants: key = f(term struct) applied at scan time
    def keyedPlan(keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      def kscan(p: String): DataFrame =
        quads.filter(col("predicate.t") === lit(0) && col("predicate.v") === p)
          .select(keyOf(col("subject")).as("sk"), col("subject"), col("object"),
            keyOf(col("object")).as("ok"))
      val site = kscan(rdf + "type").filter(col("object.v") === rds + "Site").select(col("sk").as("site"))
      val siteLabel = kscan(rdfs + "label").select(col("sk").as("site"), col("object").as("site_label"))
      def edge(p: String, s: String, o: String): DataFrame =
        kscan(p).select(col("sk").as(s), col("ok").as(o))
      val aspLabel = kscan(rdfs + "label").select(col("sk").as("wtur_asp"), col("object").as("wtur_label"))
      val wturA = kscan(rdf + "type").filter(col("object.v") === rds + "A").select(col("sk").as("wtur"))
      val gensysRA = kscan(rdf + "type").filter(col("object.v") === rds + "RA").select(col("sk").as("gensys"))
      val genGAA = kscan(rdf + "type").filter(col("object.v") === rds + "GAA").select(col("sk").as("generator"))
      val tsLabel = kscan(rdfs + "label").filter(col("object.v") === "Production").select(col("sk").as("ts"))
      val hasVal = kscan(ct + "hasValue").select(col("sk").as("dp"), col("object").as("v"))
      val hasT = kscan(ct + "hasTimestamp").select(col("sk").as("dp"), col("object").as("t"))

      site
        .join(siteLabel, "site")
        .join(edge(rds + "hasFunctionalAspect", "site", "wtur_asp"), "site")
        .join(aspLabel, "wtur_asp")
        .join(edge(rds + "hasFunctionalAspectNode", "wtur", "wtur_asp")
          .select(col("wtur_asp"), col("wtur")), "wtur_asp")
        .join(wturA, "wtur")
        .join(edge(rds + "hasFunctionalAspect", "wtur", "gensys_asp"), "wtur")
        .join(edge(rds + "hasFunctionalAspectNode", "gensys", "gensys_asp")
          .select(col("gensys_asp"), col("gensys")), "gensys_asp")
        .join(gensysRA, "gensys")
        .join(edge(rds + "hasFunctionalAspect", "gensys", "generator_asp"), "gensys")
        .join(edge(rds + "hasFunctionalAspectNode", "generator", "generator_asp")
          .select(col("generator_asp"), col("generator")), "generator_asp")
        .join(genGAA, "generator")
        .join(edge(ct + "hasTimeseries", "generator", "ts"), "generator")
        .join(tsLabel, "ts")
        .join(edge(ct + "hasDataPoint", "ts", "dp"), "ts")
        .join(hasVal, "dp")
        .join(hasT, "dp")
        .where(col("site_label.v") === "Wind Mountain" &&
          col("wtur_label.v").isin((1 to 10).map("A" + _): _*))
        .select(col("site_label.v").as("sl"), col("wtur_label.v").as("wl"),
          col("t.v").as("t"), col("v.num").as("value"))
        .orderBy("sl", "wl", "t", "value").limit(10)
    }

    def time(name: String)(mk: => DataFrame): Unit =
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        val rows = mk.collect().length
        println(f"[dp] $name%-22s run$run ${(System.nanoTime() - t0) / 1e9}%6.2f s rows $rows")
      }

    time("struct-keys")(structPlan())
    time("xxhash64-keys")(keyedPlan(c =>
      xxhash64(c.getField("t"), c.getField("v"), c.getField("dt"), c.getField("lang"))))
    time("value-string-keys")(keyedPlan(_.getField("v")))
    spark.stop()
  }
}
