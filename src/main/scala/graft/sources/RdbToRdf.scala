package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.encoding.TermCols

/**
 * Relational → RDF direct mapping (W3C "Direct Mapping" style).
 *
 * Turns a relational DataFrame into quads so the SPARQL engine can be
 * exercised — and oracle-verified — against the driver's TPC-H-ish parquet
 * tables: the SPARQL result over the mapped quads must equal the SQL result
 * over the original table.
 *
 * Deterministic IRI scheme:
 *   - row subject:      urn:g:<table>/<pk>        (composite pk: values joined by '-')
 *   - data predicate:   urn:g:<table>#<column>
 *   - fk edge predicate urn:g:<table>#ref_<target>, object = target row subject
 *
 * Implementation: one pass over the table generating an array of
 * (predicate, object) structs, then `explode` — a single parquet scan per
 * table, narrow transformation, no shuffle. At 100 TB this maps with zero
 * data movement; the expansion factor (rows × columns) is handled by Spark's
 * columnar scan + codegen'd generate.
 */
object RdbToRdf {

  val Base = "urn:g:"

  def subjectIri(table: String, pk: Column): Column =
    TermCols.iri(concat(lit(Base + table + "/"), pk.cast(StringType)))

  def predIri(table: String, colName: String): String = s"$Base$table#$colName"

  /** Literal term from a native column, typed by its Spark type. NULL cells
    * are filtered by tableToQuads, so the raw (unguarded) constructors
    * apply. */
  def litTerm(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => TermCols.fromLongRaw(c)
    case FloatType | DoubleType => TermCols.fromDoubleRaw(c)
    case _: DecimalType => TermCols.fromDecimalRaw(c)
    case BooleanType => TermCols.fromBoolean(c)
    // Spark 4 reads non-UTC-adjusted parquet timestamps as NTZ — same
    // lexical mapping to xsd:dateTime either way
    case TimestampType | TimestampNTZType => TermCols.fromTimestamp(c)
    case DateType => TermCols.typedLit(date_format(c, "yyyy-MM-dd"), graft.model.Xsd.date)
    case _ => TermCols.str(c)
  }

  /** Foreign-key spec: (fkColumn, targetTable). */
  final case class Fk(column: String, target: String)

  /**
   * Map a table to quads. `graph` = named graph IRI (None → default graph).
   * Column quads for NULL cells are dropped (RDF has no nulls).
   */
  /** Primary-key expression: >2 pk columns = "no real key" marker →
    * row-content hash subject (declared keys may be non-unique in synthetic
    * data; full rows must be); xxhash64, not md5 — 8-byte hash, no hex-string
    * materialisation. */
  def pkExpr(df: DataFrame, pkCols: Seq[String]): Column =
    if (pkCols.size > 2) conv(xxhash64(df.columns.map(col): _*).cast(StringType), 10, 16)
    else concat_ws("-", pkCols.map(c => col(c).cast(StringType)): _*)

  def tableToQuads(df: DataFrame, table: String, pkCols: Seq[String],
                   fks: Seq[Fk] = Nil, graph: Option[String] = None): DataFrame = {
    val pk = pkExpr(df, pkCols)
    val subj = subjectIri(table, pk)

    val g = graph match {
      case Some(giri) => TermCols.iri(giri)
      case None => TermCols.nullTerm
    }
    // One UNION branch per predicate (not explode-of-array): a pattern scan
    // with a bound predicate constant-folds `predicate.v = <iri>` to false in
    // every other branch, so Catalyst drops those branches entirely and the
    // parquet scan reads only the needed columns — the virtual-quads
    // equivalent of predicate-partitioned quad storage.
    val dataQuads: Seq[DataFrame] = df.schema.fields.toSeq.map { f =>
      df.select(g.as("graph"), subj.as("subject"),
          TermCols.iri(predIri(table, f.name)).as("predicate"),
          litTerm(col(f.name), f.dataType).as("object"))
    }
    val fkQuads: Seq[DataFrame] = fks.map { fk =>
      df.select(g.as("graph"), subj.as("subject"),
        TermCols.iri(predIri(table, "ref_" + fk.target)).as("predicate"),
        subjectIri(fk.target, col(fk.column).cast(StringType)).as("object"))
    }
    (dataQuads ++ fkQuads).reduce(_ unionAll _)
      .filter(col("object").isNotNull && TermCols.value(col("object")).isNotNull)
  }

  /**
   * The driver's TPC-H-ish tables mapped to one quads DF (union of per-table
   * mappings — each table scanned once). `tables` filters which tables to map
   * (all by default); `namedGraphs=true` puts each table in graph
   * urn:g:graph/<table>.
   */
  def tpchQuads(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                tables: Seq[String] = AllTables, namedGraphs: Boolean = false): DataFrame =
    mapping(spark, sfDir, tables, namedGraphs).quads

  /** The mapping as an object that can also serve star scans (engine
    * StarSource) — pass both to [[graft.engine.Graft]] so same-subject BGP
    * stars compile to one base-table scan instead of self-joins. */
  def mapping(spark: org.apache.spark.sql.SparkSession, sfDir: String,
              tables: Seq[String] = AllTables, namedGraphs: Boolean = false): RdbMapping =
    new RdbMapping(spark, sfDir, tables, namedGraphs)

  /**
   * A concrete relational→RDF mapping over the driver's parquet directory.
   *
   * `quads` is the virtual quad union (one branch per predicate — see
   * tableToQuads); `starScan` answers same-table predicate stars with a
   * single scan of the base parquet table, with the per-predicate NULL-cell
   * drops expressed as raw-column IS NOT NULL predicates so they reach the
   * parquet reader as pushed filters.
   */
  final class RdbMapping(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                         tables: Seq[String], namedGraphs: Boolean)
      extends graft.engine.StarSource {

    lazy val quads: DataFrame = tables.map { t =>
      val g = if (namedGraphs) Some(s"${Base}graph/$t") else None
      tableToQuads(tableDF(t), t, pkOf(t), fksOf(t), g)
    }.reduce(_ unionByName _)

    private val dfCache = scala.collection.mutable.Map.empty[String, DataFrame]
    private def tableDF(t: String): DataFrame =
      dfCache.getOrElseUpdate(t, spark.read.parquet(s"$sfDir/$t.parquet"))

    /** predicate IRI → (table, column-or-ref name), if it follows the
      * mapping's IRI scheme. */
    private def parsePred(iri: String): Option[(String, String)] =
      if (!iri.startsWith(Base)) None
      else iri.stripPrefix(Base).split("#", 2) match {
        case Array(t, c) if tables.contains(t) => Some((t, c))
        case _ => None
      }

    override def predKind(predIri: String): Option[Int] =
      parsePred(predIri).flatMap { case (table, cname) =>
        if (cname.startsWith("ref_")) None // fk objects are IRIs
        else tableDF(table).schema.fields.find(_.name == cname).map(_.dataType) match {
          case Some(ByteType | ShortType | IntegerType | LongType) => Some(1)
          case Some(_: DecimalType) => Some(2)
          case Some(FloatType | DoubleType) => Some(3)
          // litTerm renders these with the fixed lexical shapes kinds 4/5
          // vouch for (yyyy-MM-ddTHH:mm:ss / yyyy-MM-dd)
          case Some(TimestampType | TimestampNTZType) => Some(4)
          case Some(DateType) => Some(5)
          case _ => None
        }
      }

    override def starScan(predIris: Seq[String]): Option[(DataFrame, Map[String, String])] = {
      if (namedGraphs) return None // star quads live in named graphs, not default
      val parsed = predIris.distinct.map(p => parsePred(p).map(p -> _))
      if (parsed.exists(_.isEmpty)) return None
      val byTable = parsed.flatten.groupBy(_._2._1)
      if (byTable.size != 1) return None
      val table = byTable.keys.head
      val df = tableDF(table)
      val fieldTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val fkByName = fksOf(table).map(fk => ("ref_" + fk.target) -> fk).toMap

      val resolvedOpt: Seq[Option[(String, String, Column)]] =
        byTable(table).zipWithIndex.map { case ((iri, (_, cname)), i) =>
          val termAndRaw: Option[(Column, String)] = fkByName.get(cname) match {
            case Some(fk) =>
              Some((subjectIri(fk.target, col(fk.column).cast(StringType)), fk.column))
            case None => fieldTypes.get(cname).map(dt => (litTerm(col(cname), dt), cname))
          }
          termAndRaw.map { case (term, raw) => (iri, raw, term.as(s"__p_$i")) }
        }
      if (resolvedOpt.exists(_.isEmpty)) return None // predicate not in this table's mapping
      val resolved = resolvedOpt.flatten
      // NULL cells have no quad → the star (inner same-subject join) drops
      // the row; as raw-column predicates these reach the parquet scan
      val nonNull = resolved.map(_._2).distinct.map(col(_).isNotNull)
        .reduceOption(_ && _).getOrElse(lit(true))
      val subj = subjectIri(table, pkExpr(df, pkOf(table))).as("subject")
      val names = resolved.zipWithIndex.map { case ((iri, _, _), i) => iri -> s"__p_$i" }.toMap
      Some((df.filter(nonNull).select(subj +: resolved.map(_._3): _*), names))
    }
  }

  val AllTables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem")

  def pkOf(t: String): Seq[String] = t match {
    case "region" => Seq("r_regionkey")
    case "nation" => Seq("n_nationkey")
    case "customer" => Seq("c_custkey")
    case "supplier" => Seq("s_suppkey")
    case "part" => Seq("p_partkey")
    case "orders" => Seq("o_orderkey")
    case "lineitem" => Seq("l_orderkey", "l_linenumber", "l_partkey") // 3 cols → row-hash subject
    case "events" => Seq("event_id")
    case "documents" => Seq("doc_id")
    case "embeddings" => Seq("vec_id")
    case other => throw new IllegalArgumentException(s"unknown table $other")
  }

  def fksOf(t: String): Seq[Fk] = t match {
    case "nation" => Seq(Fk("n_regionkey", "region"))
    case "customer" => Seq(Fk("c_nationkey", "nation"))
    case "supplier" => Seq(Fk("s_nationkey", "nation"))
    case "orders" => Seq(Fk("o_custkey", "customer"))
    case "lineitem" => Seq(Fk("l_orderkey", "orders"), Fk("l_partkey", "part"),
      Fk("l_suppkey", "supplier"))
    case _ => Nil
  }
}
