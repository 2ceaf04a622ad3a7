package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.sources.RdbToRdf

/**
 * Static-numeric-kind compilation (SPlan.kinds + ExprCompiler.numericView):
 * with the star source attached, arithmetic/aggregation pre-dispatches on
 * plan-time types. Results must be identical to the dynamically-dispatched
 * plan (no star source), including unbound operands, mixed-type promotion,
 * division semantics, and empty groups.
 */
class StaticKindSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def both(tables: Seq[String], q: String): (DataFrame, DataFrame) = {
    val m = RdbToRdf.mapping(spark, dir, tables)
    (Graft(m.quads, m).select(q), Graft(m.quads).select(q))
  }

  test("int*double promotion: static and dynamic plans agree") {
    val q =
      """SELECT ?o ?x WHERE {
        |  ?o <urn:g:orders#o_totalprice> ?p .
        |  ?o <urn:g:orders#o_custkey> ?s .
        |  BIND(?p * ?s + 1 AS ?x)
        |} ORDER BY ?o""".stripMargin
    val (st, dy) = both(Seq("orders"), q)
    assert(rows(st, "o", "x") == rows(dy, "o", "x"))
    assert(st.count() > 0)
  }

  test("integer division is decimal-typed in both plans") {
    val q =
      """SELECT ?n ?half WHERE {
        |  ?n <urn:g:nation#n_nationkey> ?k .
        |  BIND(?k / 2 AS ?half)
        |} ORDER BY ?n""".stripMargin
    val (st, dy) = both(Seq("nation"), q)
    val stv = st.select(col("half.dt"), col("half.v")).collect().map(_.toSeq).toSet
    val dyv = dy.select(col("half.dt"), col("half.v")).collect().map(_.toSeq).toSet
    assert(stv == dyv)
    assert(stv.forall(_.head == graft.model.Xsd.decimal))
  }

  test("integer division by zero errors (unbound) in both plans") {
    val q =
      """SELECT ?n ?bad WHERE {
        |  ?n <urn:g:nation#n_nationkey> ?k .
        |  BIND(?k / (?k - ?k) AS ?bad)
        |} ORDER BY ?n""".stripMargin
    val (st, dy) = both(Seq("nation"), q)
    assert(st.where(col("bad").isNotNull).count() == 0)
    assert(dy.where(col("bad").isNotNull).count() == 0)
  }

  test("unbound operand (OPTIONAL) makes arithmetic error, static kind intact") {
    // customers without orders: ?tp unbound → ?x unbound
    val q =
      """SELECT ?name ?x WHERE {
        |  ?c <urn:g:customer#c_name> ?name .
        |  OPTIONAL { ?o <urn:g:orders#ref_customer> ?c .
        |             ?o <urn:g:orders#o_totalprice> ?tp . FILTER(?tp > 400000) }
        |  BIND(?tp * 2 AS ?x)
        |} ORDER BY ?name""".stripMargin
    val (st, dy) = both(Seq("customer", "orders"), q)
    assert(rows(st, "name", "x") == rows(dy, "name", "x"))
    // some customer must lack orders in sf0.001 → at least one unbound x
    assert(st.where(col("x").isNull).count() > 0)
  }

  test("SUM/AVG over static doubles match dynamic buffers, incl. all-null group") {
    val q =
      """SELECT ?name (SUM(?tp) AS ?s) (AVG(?tp) AS ?a) (MAX(?tp) AS ?mx) WHERE {
        |  ?c <urn:g:customer#c_name> ?name .
        |  OPTIONAL { ?o <urn:g:orders#ref_customer> ?c .
        |             ?o <urn:g:orders#o_totalprice> ?tp . FILTER(?tp > 400000) }
        |} GROUP BY ?name ORDER BY ?name""".stripMargin
    val (st, dy) = both(Seq("customer", "orders"), q)
    def r(df: DataFrame) =
      df.select(col("name.v"), round(col("s.num"), 6), round(col("a.num"), 6), col("mx.v"))
        .collect().map(_.toSeq.map(x => if (x == null) "∅" else x.toString)).toSet
    assert(r(st) == r(dy))
    // empty group → SUM = 0 (xsd:integer), AVG = 0
    val zero = st.where(col("name.v").isNotNull && col("mx").isNull)
    assert(zero.count() > 0)
    assert(zero.where(col("s.v") =!= "0").count() == 0)
  }

  test("kind dropped when a UNION mixes types (no wrong static dispatch)") {
    // ?v is double from events#value in one branch, string from event_type in
    // the other → no static kind; SUM must poison on the string rows
    val q =
      """SELECT (SUM(?v) AS ?s) WHERE {
        |  { ?e <urn:g:events#value> ?v } UNION { ?e <urn:g:events#event_type> ?v }
        |}""".stripMargin
    val (st, dy) = both(Seq("events"), q)
    assert(rows(st, "s") == rows(dy, "s"))
    assert(st.where(col("s").isNotNull).count() == 0) // poisoned by strings
  }

  test("join of star groups keeps agreeing kinds; BIND over both sides works") {
    val q =
      """SELECT ?o ?gain WHERE {
        |  ?o <urn:g:orders#o_totalprice> ?tp .
        |  ?o <urn:g:orders#ref_customer> ?c .
        |  ?c <urn:g:customer#c_acctbal> ?bal .
        |  BIND(?tp - ?bal AS ?gain)
        |  FILTER(?gain > 100000)
        |} ORDER BY ?o""".stripMargin
    val (st, dy) = both(Seq("orders", "customer"), q)
    assert(rows(st, "o", "gain") == rows(dy, "o", "gain"))
    assert(st.count() > 0)
  }
}
