package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.model.{BNode, Iri, RdfTerm}

/**
 * Write-ahead update log: merge-on-read persistence for SPARQL UPDATE.
 *
 * At 100 TB, re-writing the whole store per update (`save` after every
 * `update`) makes the write the dominant cost of ANY mutation. A logged
 * store instead appends the UPDATE REQUEST TEXT itself — the smallest
 * faithful delta a SPARQL store has: quad-level deltas cannot represent
 * CLEAR/DROP/COPY/MOVE without materialising whole graphs, while the
 * request replays them for free — and re-applies the log lazily on load
 * through the same scale-audited executor (broadcast-pinned anti/semi
 * joins, weight-bounded lineage cuts). `compact` folds the log into a new
 * base in ONE materialisation.
 *
 * Layout under `dir`:
 *   base/       parquet in [[QuadStore.save]]'s (p,s)-clustered layout
 *   log/NNNNNNNN.ru   one UTF-8 SPARQL Update request per file, replayed
 *                     in sequence order
 *   registry    one named-graph IRI per line — graphs that exist while
 *                     EMPTY (CREATE'd, CLEARed, ADD destinations), which
 *                     parquet alone cannot record
 *
 * Semantics notes: replay re-executes requests, so INSERT-template blank
 * nodes receive fresh labels per load (bnode labels are not significant),
 * and a `LOAD <http://…>` replays against the document's CURRENT content —
 * compact if byte-stable history matters. Single writer assumed (sequence
 * numbers are allocated by directory listing); appends themselves are
 * atomic (tmp file + ATOMIC_MOVE).
 *
 * The reference stubs all of UPDATE (store.rs:409-414), so it has no
 * counterpart surface; this is the persistence half of exceeding it.
 */
object UpdateLog {

  /** Initialise a logged store directory from a snapshot. */
  def init(store: QuadStore, dir: String): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d.resolve("log"))
    store.save(d.resolve("base").toString)
    writeRegistry(d, store.reg)
  }

  /** Append one update request to the log — no Spark job, no base rewrite.
    * The mutation becomes visible to the next [[load]]. */
  def append(dir: String, updateText: String): Unit = {
    // validate eagerly: a request that cannot parse must fail the APPEND,
    // not every future load
    graft.sparql.SparqlParser.parseUpdate(updateText)
    val log = Paths.get(dir).resolve("log")
    Files.createDirectories(log)
    val n = entries(log).lastOption
      .map(p => p.getFileName.toString.stripSuffix(".ru").toLong + 1).getOrElse(1L)
    val name = f"$n%08d.ru"
    val tmp = log.resolve(s".$name.tmp")
    Files.write(tmp, updateText.getBytes("UTF-8"))
    Files.move(tmp, log.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Open the logged store: base parquet + registry, then the log replayed
    * in order (lazily — nothing materialises until the store is read).
    * Replay cuts lineage every `graft.update.logReplayCut` (default 8)
    * requests, the cross-request analogue of UpdateExec's in-request
    * weight cut; compact regularly to keep replay cost bounded. */
  def load(spark: SparkSession, dir: String): QuadStore = {
    val d = Paths.get(dir)
    val base = readRegistry(d).foldLeft(
      QuadStore.load(spark, d.resolve("base").toString))(_ insertNamedGraph _)
    val cutEvery = sys.props.get("graft.update.logReplayCut").map(_.toInt).getOrElse(8)
    entries(d.resolve("log")).zipWithIndex.foldLeft(base) { case (st, (p, i)) =>
      val next = st.update(new String(Files.readAllBytes(p), "UTF-8"))
      if ((i + 1) % cutEvery == 0) next.withQuads(next.quads.localCheckpoint())
      else next
    }
  }

  /** Fold the log into a new base — the ONE full materialisation — then
    * drop the replayed entries. Requests appended while the compaction
    * job runs survive: only the entries read at the start are deleted. */
  def compact(spark: SparkSession, dir: String): QuadStore = {
    val d = Paths.get(dir)
    val consumed = entries(d.resolve("log"))
    val st = load(spark, dir)
    st.save(d.resolve("base.next").toString)
    val reg = st.reg
    deleteRec(d.resolve("base"))
    Files.move(d.resolve("base.next"), d.resolve("base"))
    writeRegistry(d, reg)
    consumed.foreach(Files.delete)
    // uploaded documents (the server's logged data POSTs) whose LOAD entry
    // was just folded are garbage — keep only those a surviving entry
    // still references
    val docs = d.resolve("docs")
    if (Files.isDirectory(docs)) {
      val live = entries(d.resolve("log"))
        .map(p => new String(Files.readAllBytes(p), "UTF-8")).mkString("\n")
      Files.list(docs).iterator().asScala.toSeq
        .filterNot(p => live.contains(p.getFileName.toString))
        .foreach(Files.delete)
    }
    readRegistry(d).foldLeft(
      QuadStore.load(spark, d.resolve("base").toString))(_ insertNamedGraph _)
  }

  // ----------------------------------------------------------------- helpers

  private def entries(log: Path): Seq[Path] =
    if (!Files.isDirectory(log)) Nil
    else Files.list(log).iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{8}\\.ru")).toSeq
      .sortBy(_.getFileName.toString)

  private def writeRegistry(d: Path, reg: Set[RdfTerm]): Unit = {
    val lines = reg.toSeq.collect { case Iri(v) => v; case BNode(v) => "_:" + v }.sorted
    Files.write(d.resolve("registry"), lines.mkString("\n").getBytes("UTF-8"))
  }

  private def readRegistry(d: Path): Seq[RdfTerm] = {
    val f = d.resolve("registry")
    if (!Files.exists(f)) Nil
    else new String(Files.readAllBytes(f), "UTF-8").linesIterator.filter(_.nonEmpty).map {
      case s if s.startsWith("_:") => BNode(s.drop(2))
      case s => Iri(s)
    }.toSeq
  }

  private def deleteRec(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}
