package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Iri

/**
 * Command-line toolkit — the Spark counterpart of the reference's
 * `rdf-fusion` CLI (/root/reference/cli/src/cli.rs):
 *
 *   serve   --bind host:port [--union-default-graph] [--load path ...]
 *           [--log dir]
 *           Start the SPARQL-protocol HTTP server (read + data-POST mode).
 *           --log makes the store durable: mutations append to a
 *           write-ahead update log under dir and survive restarts.
 *   convert --from-file in.ttl --to-file out.nq [--lenient]
 *           [--from-graph IRI | --from-default-graph] [--to-graph IRI]
 *           Convert between RDF serialisations; formats are taken from the
 *           file extensions (.nt .nq .ttl .trig .n3 .rdf/.owl/.xml in;
 *           .nt .nq .ttl .trig .rdf out). Conversion runs distributed and
 *           writes a directory of part files (Spark semantics), unlike the
 *           reference's single-file stdin/stdout pipe.
 *
 * Run: sbt "runMain graft.Cli serve --bind 0.0.0.0:7878 --load data.nt"
 *      sbt "runMain graft.Cli convert --from-file a.ttl --to-file out.nq"
 */
object Cli {

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("serve") => serve(parseFlags(args.drop(1)))
    case Some("convert") => convert(parseFlags(args.drop(1)))
    case Some("update") => update(parseFlags(args.drop(1)))
    case other =>
      System.err.println(s"unknown command: ${other.getOrElse("")} (expected serve | convert | update)")
      sys.exit(2)
  }

  /** `--flag v1 v2 --bool --next x` → Map(flag -> [v1,v2], bool -> []). */
  private def parseFlags(args: Array[String]): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.Map.empty[String, Seq[String]]
    var key: String = null
    args.foreach { a =>
      if (a.startsWith("--")) { key = a.drop(2); out.getOrElseUpdate(key, Nil) }
      else if (key != null) out(key) = out(key) :+ a
      else { System.err.println(s"stray argument: $a"); sys.exit(2) }
    }
    out.toMap
  }

  private def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def serve(flags: Map[String, Seq[String]]): Unit = {
    val spark = session()
    val bind = flags.getOrElse("bind", Seq("0.0.0.0:7878")).head
    // host:port — bind to the REQUESTED interface (a loopback bind must not
    // expose the unauthenticated data-POST route on all interfaces)
    val (host, port) = bind.lastIndexOf(':') match {
      case -1 => ("0.0.0.0", bind.toInt)
      case i => (bind.take(i), bind.drop(i + 1).toInt)
    }
    val union = flags.contains("union-default-graph")
    val initial = flags.getOrElse("load", Nil) match {
      case Nil => null
      case paths => paths.map(p => QuadStore.loadFile(spark, p).quads)
        .reduce(_ unionAll _).localCheckpoint()
    }
    // --log dir: durable store — mutations append to a write-ahead update
    // log under dir and survive restarts (an existing dir wins over --load)
    val logDir = flags.get("log").flatMap(_.headOption)
    val server = graft.web.SparqlServer.start(spark, initial, port,
      unionDefaultGraph = union, host = host, logDir = logDir)
    println(s"[graft] serving SPARQL protocol on $host:${server.boundPort}" +
      (if (union) " (union default graph)" else "") +
      logDir.fold("")(d => s" (update log: $d)"))
    Thread.currentThread.join() // serve until killed
  }

  private[graft] def convert(flags: Map[String, Seq[String]]): Unit = {
    val spark = session()
    def one(k: String): String = flags.getOrElse(k, Nil).headOption
      .getOrElse { System.err.println(s"missing --$k"); sys.exit(2); "" }
    val fromFile = one("from-file")
    val toFile = one("to-file")
    val lenient = flags.contains("lenient")

    val lower = fromFile.toLowerCase
    var quads: DataFrame =
      if (lower.endsWith(".nt") || lower.endsWith(".nq"))
        sources.NTriples.read(spark, fromFile, quads = lower.endsWith(".nq"), lenient = lenient)
      else QuadStore.loadFile(spark, fromFile).quads

    // graph scoping (reference --from-graph / --from-default-graph / --to-graph)
    flags.get("from-graph").flatMap(_.headOption).foreach { g =>
      quads = quads.filter(coalesce(QuadStore.termEq(col("graph"), Iri(g)), lit(false)))
        .withColumn("graph", lit(null).cast(encoding.TermCols.schema))
    }
    if (flags.contains("from-default-graph"))
      quads = quads.filter(col("graph").isNull)
    flags.get("to-graph").flatMap(_.headOption).foreach { g =>
      val gLit = graft.engine.ExprCompiler.termLit(Iri(g))
      quads = quads.withColumn("graph",
        when(col("graph").isNull, gLit).otherwise(col("graph")))
    }

    val store = QuadStore(quads)
    toFile.toLowerCase match {
      case f if f.endsWith(".nq") => store.dumpNQuads(toFile)
      case f if f.endsWith(".nt") => store.dumpGraph(toFile, None)
      case f if f.endsWith(".ttl") => store.dumpTurtle(toFile)
      case f if f.endsWith(".trig") => store.dumpTriG(toFile)
      case f if f.endsWith(".rdf") || f.endsWith(".xml") => store.dumpRdfXml(toFile)
      case other => System.err.println(s"unsupported output format: $other"); sys.exit(2)
    }
    println(s"[graft] converted $fromFile -> $toFile")
  }

  /**
   * update --load in.nq [--load more.ttl ...] (--update "SPARQL" | --update-file req.ru)
   *        --out dir/
   * Apply a SPARQL 1.1 Update request to the loaded dataset and dump the
   * result as N-Quads. (The reference CLI has no update command — its
   * store stubs Update entirely; this exceeds it.)
   */
  private[graft] def update(flags: Map[String, Seq[String]]): Unit = {
    val spark = session()
    val loads = flags.getOrElse("load", Nil)
    val text = flags.get("update").flatMap(_.headOption)
      .orElse(flags.get("update-file").flatMap(_.headOption).map(p =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")))
      .getOrElse { System.err.println("missing --update or --update-file"); sys.exit(2); "" }
    val out = flags.getOrElse("out", Nil).headOption
      .getOrElse { System.err.println("missing --out"); sys.exit(2); "" }
    val initial =
      if (loads.isEmpty) QuadStore.empty(spark)
      else QuadStore(loads.map(p => QuadStore.loadFile(spark, p).quads).reduce(_ unionAll _))
    val updated = initial.update(text)
    updated.dumpNQuads(out)
    println(s"[graft] update applied; ${updated.count()} quads -> $out")
  }
}
