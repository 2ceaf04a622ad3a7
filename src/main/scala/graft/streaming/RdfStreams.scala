package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.NTriples

/**
 * Streaming RDF ingestion — beyond the reference (batch-only engine; its
 * `SendableRecordBatchStream` is pull-based batch iteration, SURVEY §2.9),
 * expressed Spark-first as Structured Streaming over line-oriented RDF:
 * `readStream.text` on a directory of N-Triples/N-Quads files, the same
 * per-line parser as the batch reader applied via a typed flatMap (streams
 * cannot drop to RDDs), output in the engine's quad schema — so pattern
 * filters (`QuadStore.termEq`-style field predicates) and windowed
 * aggregations compose directly on the stream. Malformed lines follow the
 * batch reader's strict contract (dropped only under `lenient`).
 */
object RdfStreams {

  /** Mirror of the PlainTerm struct with encoder-friendly field types; field
    * names/order must match [[graft.encoding.TermCols.schema]]. */
  private[streaming] final case class FlatTerm(
      t: Byte, v: String, dt: String, lang: String, num: Option[Double])
  private[streaming] final case class FlatQuad(
      graph: Option[FlatTerm], subject: FlatTerm, predicate: FlatTerm, `object`: FlatTerm)

  private def flat(t: RdfTerm): FlatTerm = t match {
    case Iri(v) => FlatTerm(TermType.Iri, v, null, null, None)
    case BNode(v) => FlatTerm(TermType.BlankNode, v, null, null, None)
    case Lit(v, dt, lang) =>
      val dtCanon = if (dt == Xsd.string && lang.isEmpty) null
                    else if (lang.isDefined) Rdf.langString else dt
      FlatTerm(TermType.Literal, v, dtCanon, lang.orNull,
        Option(NTriples.numOf(v, dt)).map(_.doubleValue))
  }

  /**
   * Open a streaming quads DataFrame over a directory of N-Triples /
   * N-Quads files (new files picked up per micro-batch). Standard file-
   * source options apply (`maxFilesPerTrigger`, globs, archiving).
   */
  def readNQuads(spark: SparkSession, dir: String, lenient: Boolean = false): DataFrame = {
    import spark.implicits._
    val quads = spark.readStream.text(dir).as[String].flatMap { line =>
      (if (lenient) NTriples.parseLineRecovering(line) else NTriples.parseLine(line))
        .map(q => FlatQuad(q.graph.map(flat), flat(q.subject), flat(q.predicate), flat(q.obj)))
    }
    // encoder gives num as nullable double already; align nullability/naming
    quads.toDF("graph", "subject", "predicate", "object")
  }

  /** Per-predicate quad counts over ingest-time windows — the smallest
    * useful streaming aggregate over an RDF stream (monitor ingest shape).
    * Quads carry no event time, so the window keys on processing time
    * stamped at ingest; a caller with a real event-time column can build
    * the same aggregate directly. */
  def predicateCounts(quads: DataFrame, windowLen: String = "1 minute",
                      watermark: String = "2 minutes"): DataFrame =
    quads
      .withColumn("__ingest_ts", current_timestamp())
      .withWatermark("__ingest_ts", watermark)
      .groupBy(window(col("__ingest_ts"), windowLen), col("predicate.v").as("predicate"))
      .agg(count(lit(1)).as("n"))
}
