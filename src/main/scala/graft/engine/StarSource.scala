package graft.engine

import org.apache.spark.sql.DataFrame

/**
 * Optional capability of a quad source: serve a whole same-subject "star" of
 * bound-predicate patterns from ONE scan of an underlying base relation (the
 * classic RDF property-table access path, cf. S2RDF/Jena property tables).
 *
 * Why it matters at scale: a BGP star of k patterns over the generic quad
 * relation costs k scans + (k-1) shuffle joins on the subject key. When the
 * quads are a virtual mapping over a relational table (sources/RdbToRdf), the
 * same star is a single narrow scan — no shuffle at all — and Catalyst can
 * prune the subject-key computation entirely when the subject variable is
 * dead downstream (e.g. aggregations over the star's values). For row-hash
 * subjects that also removes the read-every-column hash input.
 *
 * The reference engine has no analogue (its quads are physical); this is a
 * Spark-first optimization enabled by the mapped storage layout.
 */
trait StarSource {

  /**
   * A DataFrame with column `subject` plus one PlainTerm column per distinct
   * predicate IRI in `predIris` (column names given by the returned map),
   * containing exactly the subjects of the DEFAULT graph that carry ALL the
   * given predicates — i.e. the inner same-subject join of the patterns.
   * Returns None when the predicates do not co-locate in a single base
   * relation of this source (caller falls back to per-pattern quad scans).
   */
  def starScan(predIris: Seq[String]): Option[(DataFrame, Map[String, String])]

  /**
   * Statically-known kind (1 = integer, 2 = decimal, 3 = double,
   * 4 = dateTime with the fixed `yyyy-MM-ddTHH:mm:ss` lexical shape,
   * 5 = date `yyyy-MM-dd`) of every object this source emits for the given
   * predicate — derivable when the predicate maps a relational column of a
   * fixed native type. Lets the expression compiler pre-dispatch
   * arithmetic/aggregation/comparisons and date-part accessors (the
   * datatype CASE trees constant-fold; YEAR() becomes a substring). Terms
   * must be canonically rendered (see ExprCompiler.Env invariant). Must
   * only be answered if it holds for ALL quads of this predicate in the
   * Graft's quad relation.
   */
  def predKind(predIri: String): Option[Int] = None
}

object StarSource {
  /** A kinds-only capability for plain quad stores: no property-table scan
    * (starScan always declines), but per-predicate static object kinds so
    * the expression compiler pre-dispatches arithmetic/date accessors (the
    * datatype CASE trees constant-fold) — usable whenever the data producer
    * can vouch for uniform, canonically-rendered object types per predicate
    * (e.g. a generated or schema-validated dataset). */
  def kindsOnly(kinds: Map[String, Int]): StarSource = new StarSource {
    override def starScan(predIris: Seq[String]): Option[(DataFrame, Map[String, String])] = None
    override def predKind(predIri: String): Option[Int] = kinds.get(predIri)
  }
}
