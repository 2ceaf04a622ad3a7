package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.encoding.TermCols
import graft.engine.Graft

/**
 * Scale probe: synthesises a multi-million-quad graph directly from
 * `spark.range` (no file IO, perfectly parallel — the shape of a
 * vertically-partitioned quad store à la S2RDF, VLDB 2016) and exercises the
 * hot paths: star BGP join + aggregation, filtered scan, seeded closure over
 * a deep graph. Prints one timing line per stage.
 *
 * Run: sbt "runMain graft.tools.ScaleProbe [nPeople]" (default 1,000,000 →
 * 5M quads).
 */
object ScaleProbe {

  private val EX = "urn:sp:"

  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
  }

  /** n people with name/age/city + a follows edge chain with shortcuts. */
  def syntheticQuads(spark: SparkSession, n: Long): DataFrame = {
    val ids = spark.range(n)
    def subj = TermCols.iri(concat(lit(EX + "p"), col("id")))
    def quad(p: String, o: org.apache.spark.sql.Column) =
      ids.select(TermCols.nullTerm.as("graph"), subj.as("subject"),
        TermCols.iri(EX + p).as("predicate"), o.as("object"))
    quad("name", TermCols.str(concat(lit("person-"), col("id"))))
      .unionAll(quad("age", TermCols.fromLong(col("id") % 90 + 10)))
      .unionAll(quad("city", TermCols.iri(concat(lit(EX + "city"), col("id") % 1000))))
      .unionAll(quad("follows", TermCols.iri(concat(lit(EX + "p"), (col("id") + 1) % n))))
      .unionAll(quad("score", TermCols.fromDouble((col("id") % 10000).cast("double") / 100.0)))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val quads = syntheticQuads(spark, n)
    val g = Graft(quads)
    time(s"materialise ${5 * n / 1000000}M quads (count)")(quads.count())

    time("filtered scan: age > 95")(
      g.select(s"SELECT ?x WHERE { ?x <${EX}age> ?a . FILTER(?a > 95) }").count())

    time("star BGP (3 patterns) + group by city")(
      g.select(
        s"""SELECT ?c (COUNT(?x) AS ?n) (AVG(?a) AS ?avg) WHERE {
           |  ?x <${EX}age> ?a . ?x <${EX}city> ?c . ?x <${EX}score> ?s .
           |  FILTER(?s > 50)
           |} GROUP BY ?c""".stripMargin).count())

    time("optional + minus")(
      g.select(
        s"""SELECT ?x WHERE { ?x <${EX}name> ?nm .
           |  OPTIONAL { ?x <${EX}age> ?a FILTER(?a > 80) }
           |  FILTER(!BOUND(?a)) }""".stripMargin).count())

    // relational star-fusion probe: 20M-row base table mapped to quads;
    // fused same-subject star (1 scan) vs per-pattern scans + subject joins
    locally {
      val dir = "/tmp/graft-scaleprobe"
      val tbl = new java.io.File(s"$dir/events.parquet")
      if (!tbl.exists()) {
        spark.range(20000000L).select(
            col("id").as("event_id"),
            concat(lit("t"), col("id") % 20).as("event_type"),
            ((col("id") % 10000).cast("double") / 100.0).as("value"),
            (col("id") % 100000).as("user_id"))
          .write.mode("overwrite").parquet(tbl.toString)
      }
      val m = graft.sources.RdbToRdf.mapping(spark, dir, Seq("events"))
      val q =
        s"""SELECT ?t (COUNT(?e) AS ?n) (SUM(?v) AS ?total) WHERE {
           |  ?e <urn:g:events#event_type> ?t .
           |  ?e <urn:g:events#value> ?v .
           |} GROUP BY ?t""".stripMargin
      time("star agg over 20M-row table, FUSED (1 scan + static kinds)")(
        Graft(m.quads, m).select(q).count())
      time("star agg over 20M-row table, unfused (2 scans + subject join)")(
        Graft(m.quads).select(q).count())
    }

    // chain restricted to 300 nodes: seeded walk is linear in depth
    val chainNodes = (0 to 300).map(i => EX + "p" + i).toSet
    val chain = quads.filter(col("predicate.v") === EX + "follows")
      .filter(col("subject.v").isin(chainNodes.toSeq: _*))
      .unionAll(quads.filter(col("predicate.v") =!= EX + "follows"))
    time("seeded closure: 300-hop walk from one node")(
      Graft(chain).select(s"SELECT ?y WHERE { <${EX}p0> <${EX}follows>+ ?y }").count())

    spark.stop()
  }
}
