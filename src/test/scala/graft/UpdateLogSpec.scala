package graft

import java.nio.file.{Files, Paths}
import graft.model._
import graft.sources.Turtle

/** Write-ahead update-log persistence: append is base-rewrite-free, load
  * replays lazily (incl. across the replay lineage cut), compact folds the
  * log into a new base once and preserves the registered-empty-graph
  * registry that parquet alone cannot record. */
class UpdateLogSpec extends SparkSpec {

  private def mkStore(quads: (String, String, String)*): QuadStore =
    QuadStore(Turtle.quadsToDF(spark,
      quads.map(q => RdfQuad(None, Iri(q._1), Iri(q._2), Iri(q._3)))))

  private def tuples(st: QuadStore): Set[(Option[String], String, String, String)] =
    st.quads.collect().toSet.map { (r: org.apache.spark.sql.Row) =>
      (Option(r.getStruct(0)).map(_.getString(1)),
        r.getStruct(1).getString(1), r.getStruct(2).getString(1), r.getStruct(3).getString(1))
    }

  private def graphs(st: QuadStore): Set[String] =
    st.namedGraphs().collect().map(_.getStruct(0).getString(1)).toSet

  test("append + load replays the log; compact folds it and keeps the registry") {
    val dir = Files.createTempDirectory("graft_updlog").toString
    UpdateLog.init(mkStore(("urn:a", "urn:p", "urn:b"), ("urn:c", "urn:p", "urn:d")), dir)

    UpdateLog.append(dir, "INSERT DATA { <urn:e> <urn:p> <urn:f> }")
    UpdateLog.append(dir, "DELETE WHERE { <urn:a> ?p ?o }")
    UpdateLog.append(dir, "CREATE GRAPH <urn:g:empty>")
    UpdateLog.append(dir,
      "INSERT DATA { GRAPH <urn:g1> { <urn:x> <urn:q> <urn:y> } }")

    val expectedQuads = Set(
      (None: Option[String], "urn:c", "urn:p", "urn:d"),
      (None, "urn:e", "urn:p", "urn:f"),
      (Some("urn:g1"), "urn:x", "urn:q", "urn:y"))
    val replayed = UpdateLog.load(spark, dir)
    assert(tuples(replayed) == expectedQuads)
    assert(graphs(replayed) == Set("urn:g:empty", "urn:g1"))
    // nothing was folded: the base still holds the pre-log state
    assert(tuples(QuadStore.load(spark, Paths.get(dir).resolve("base").toString)) ==
      Set((None: Option[String], "urn:a", "urn:p", "urn:b"), (None, "urn:c", "urn:p", "urn:d")))

    val compacted = UpdateLog.compact(spark, dir)
    assert(tuples(compacted) == expectedQuads)
    assert(graphs(compacted) == Set("urn:g:empty", "urn:g1"),
      "compaction must persist the registered-empty graph via the registry sidecar")
    assert(Files.list(Paths.get(dir).resolve("log")).count() == 0, "log not truncated")

    // appends after compaction continue the sequence and replay on top
    UpdateLog.append(dir, "DROP GRAPH <urn:g:empty>")
    val after = UpdateLog.load(spark, dir)
    assert(graphs(after) == Set("urn:g1"))
    assert(tuples(after) == expectedQuads)
  }

  test("replay lineage cut fires mid-log without changing results") {
    val dir = Files.createTempDirectory("graft_updlog_cut").toString
    UpdateLog.init(mkStore(("urn:s0", "urn:p", "urn:o0")), dir)
    (1 to 5).foreach(i => UpdateLog.append(dir, s"INSERT DATA { <urn:s$i> <urn:p> <urn:o$i> }"))
    val prev = sys.props.put("graft.update.logReplayCut", "2")
    try {
      val st = UpdateLog.load(spark, dir)
      assert(tuples(st).map(_._2) == (0 to 5).map(i => s"urn:s$i").toSet)
    } finally prev match {
      case Some(v) => sys.props.update("graft.update.logReplayCut", v)
      case None => sys.props.remove("graft.update.logReplayCut")
    }
  }

  test("append rejects an unparseable request instead of poisoning every load") {
    val dir = Files.createTempDirectory("graft_updlog_bad").toString
    UpdateLog.init(mkStore(("urn:a", "urn:p", "urn:b")), dir)
    intercept[Exception](UpdateLog.append(dir, "INSERT GARBAGE { this is not sparql }"))
    assert(Files.list(Paths.get(dir).resolve("log")).count() == 0)
    assert(tuples(UpdateLog.load(spark, dir)).nonEmpty)
  }
}
