package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.engine.Graft
import graft.gen.BsbmGen

/**
 * Executes every BSBM Explore + Business Intelligence query the reference
 * benches (/root/reference/bench/tests/query_results/queries/, read-only)
 * end-to-end over the deterministic BSBM-shaped dataset. The reference's
 * snapshots come from the upstream BSBM generator's data (not available
 * offline), so result values differ; what this spec pins is that the
 * whole query set — DESCRIBE and CONSTRUCT included — runs through the
 * engine and selects non-trivial rows on schema-faithful data.
 */
// 126 s of the measured 1687 s full-suite runtime (r10 timing run):
// excluded from the driver's budgeted `sbt test` gate, still run in the
// builder's own loop (see build.sbt testOptions).
@graft.SlowTest
class BsbmSpec extends SparkSpec {

  private val qdir = Paths.get("/root/reference/bench/tests/query_results/queries")
  private def text(name: String): String =
    new String(Files.readAllBytes(qdir.resolve(s"$name.sparql")), "UTF-8")

  private lazy val graft = Graft(BsbmGen.quads(spark, 1000).repartition(32).localCheckpoint())

  // every concrete instance IRI the adapted queries reference must exist
  test("referenced instance IRIs exist in the generated data") {
    import org.apache.spark.sql.functions._
    val subjects = graft.quads.select(col("subject").getField("v").as("s")).distinct()
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
    val present = subjects.where(
      needed.map(n => col("s") === (BsbmGen.Inst + n)).reduce(_ || _)).count()
    assert(present == needed.size, s"only $present of ${needed.size} referenced IRIs exist")
  }

  private val mustReturnRows = Set(
    "explore-q1", "explore-q2-non-empty-optional", "explore-q3", "explore-q4",
    "explore-q5", "explore-q7", "explore-q8", "explore-q10", "explore-q11",
    "explore-q12", "bi-q1", "bi-q2", "bi-q3", "bi-q4", "bi-q5", "bi-q6", "bi-q7", "bi-q8")

  private val all = Files.list(qdir).iterator().asScala
    .map(_.getFileName.toString).filter(f => f.startsWith("explore-") || f.startsWith("bi-"))
    .map(_.stripSuffix(".sparql")).toSeq.sorted

  all.foreach { name =>
    test(s"$name executes over the generated dataset") {
      val rows = graft.query(text(name)).collect()
      if (mustReturnRows(name)) assert(rows.nonEmpty, s"$name returned no rows")
    }
  }

  test("found the full explore + bi query set") {
    assert(all.size == 20, s"expected 20 queries, found ${all.size}: $all")
  }
}
