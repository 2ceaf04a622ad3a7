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
    case TimestampType => TermCols.fromTimestamp(c)
    case DateType => TermCols.typedLit(date_format(c, "yyyy-MM-dd"), graft.model.Xsd.date)
    case _ => TermCols.str(c)
  }

  /** Foreign-key spec: (fkColumn, targetTable). */
  final case class Fk(column: String, target: String)

  /**
   * Map a table to quads. `graph` = named graph IRI (None → default graph).
   * Column quads for NULL cells are dropped (RDF has no nulls).
   */
  def tableToQuads(df: DataFrame, table: String, pkCols: Seq[String],
                   fks: Seq[Fk] = Nil, graph: Option[String] = None): DataFrame = {
    // >2 pk columns = "no real key" marker → row-content hash subject
    // (declared keys may be non-unique in synthetic data; full rows must be);
    // xxhash64, not md5 — 8-byte hash, no hex-string materialisation
    val pk = if (pkCols.size > 2) conv(xxhash64(df.columns.map(col): _*).cast(StringType), 10, 16)
             else concat_ws("-", pkCols.map(c => col(c).cast(StringType)): _*)
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
                tables: Seq[String] = AllTables, namedGraphs: Boolean = false): DataFrame = {
    val parts = tables.map { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val g = if (namedGraphs) Some(s"${Base}graph/$t") else None
      tableToQuads(df, t, pkOf(t), fksOf(t), g)
    }
    parts.reduce(_ unionByName _)
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
