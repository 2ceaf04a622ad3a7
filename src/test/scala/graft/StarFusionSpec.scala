package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.sources.RdbToRdf

/**
 * Star-join fusion: same-subject bound-predicate BGP groups over the
 * relational mapping must compile to ONE base-table scan (property-table
 * access path) and produce exactly the same solutions as the unfused
 * per-pattern quad-scan plan.
 */
class StarFusionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fusedAndPlain(tables: Seq[String], q: String): (DataFrame, DataFrame) = {
    val m = RdbToRdf.mapping(spark, dir, tables)
    // baseline = fusion OFF (plain per-pattern joins); Graft(m.quads) would
    // still fuse through the generic quad-star path
    (Graft(m.quads, m).select(q), Graft.unfused(m.quads).select(q))
  }

  private def scanCount(df: DataFrame): Int =
    // logical relations after optimization (executedPlan hides behind AQE)
    df.queryExecution.optimizedPlan.collectLeaves()
      .count(_.getClass.getSimpleName.contains("LogicalRelation"))

  test("3-pattern star over lineitem fuses to a single scan, same result") {
    val q =
      """SELECT ?flag (SUM(?rev) AS ?revenue) WHERE {
        |  ?l <urn:g:lineitem#l_returnflag> ?flag .
        |  ?l <urn:g:lineitem#l_extendedprice> ?p .
        |  ?l <urn:g:lineitem#l_discount> ?d .
        |  BIND(?p * (1 - ?d) AS ?rev)
        |} GROUP BY ?flag ORDER BY ?flag""".stripMargin
    val (fused, plain) = fusedAndPlain(Seq("lineitem"), q)
    assert(scanCount(fused) == 1, fused.queryExecution.optimizedPlan.toString)
    // double SUM is summation-order-dependent → compare rounded
    def r(df: DataFrame): Set[(String, Double)] =
      df.select(col("flag.v"), round(col("revenue.num"), 0)).collect()
        .map(x => (x.getString(0), x.getDouble(1))).toSet
    assert(r(fused) == r(plain))
  }

  test("star with fk edge + bound object filter fuses, same result") {
    val q =
      """SELECT ?o ?c WHERE {
        |  ?o <urn:g:orders#ref_customer> ?c .
        |  ?o <urn:g:orders#o_orderstatus> "F" .
        |} ORDER BY ?o""".stripMargin
    val (fused, plain) = fusedAndPlain(Seq("orders", "customer"), q)
    assert(scanCount(fused) == 1)
    assert(rows(fused, "o", "c") == rows(plain, "o", "c"))
  }

  test("mixed star + cross-table pattern joins star scan to other scans") {
    val q =
      """SELECT ?name ?status ?price WHERE {
        |  ?o <urn:g:orders#o_orderstatus> ?status .
        |  ?o <urn:g:orders#o_totalprice> ?price .
        |  ?o <urn:g:orders#ref_customer> ?c .
        |  ?c <urn:g:customer#c_name> ?name .
        |  FILTER(?price > 400000)
        |}""".stripMargin
    val (fused, plain) = fusedAndPlain(Seq("orders", "customer"), q)
    // orders star (3 patterns) fused to 1 scan + 1 customer scan = 2 scans
    assert(scanCount(fused) == 2, fused.queryExecution.executedPlan.toString)
    assert(rows(fused, "name", "status", "price") == rows(plain, "name", "status", "price"))
  }

  test("repeated object variable inside a star becomes an equality filter") {
    // ?n with the same var bound to two predicates: only rows where the two
    // column values are equal survive (none in nation: n_name != n_comment)
    val q =
      """SELECT ?n ?x WHERE {
        |  ?n <urn:g:nation#n_name> ?x .
        |  ?n <urn:g:nation#n_comment> ?x .
        |}""".stripMargin
    val (fused, plain) = fusedAndPlain(Seq("nation"), q)
    assert(fused.count() == plain.count())
  }

  test("EXISTS inner star fuses; result matches unfused") {
    val q =
      """SELECT ?name WHERE {
        |  ?c <urn:g:customer#c_name> ?name .
        |  FILTER EXISTS { ?o <urn:g:orders#ref_customer> ?c .
        |                  ?o <urn:g:orders#o_totalprice> ?tp . FILTER(?tp > 300000) }
        |} ORDER BY ?name""".stripMargin
    val (fused, plain) = fusedAndPlain(Seq("customer", "orders"), q)
    assert(rows(fused, "name") == rows(plain, "name"))
  }

  test("named-graph scope falls back to quad scans (no wrong fusion)") {
    val m = RdbToRdf.mapping(spark, dir, Seq("nation"), namedGraphs = true)
    val g = Graft(m.quads, m)
    val res = g.select(
      """SELECT ?n ?name WHERE {
        |  GRAPH <urn:g:graph/nation> { ?n <urn:g:nation#n_name> ?name .
        |                               ?n <urn:g:nation#n_regionkey> ?rk } }""".stripMargin)
    assert(res.count() == 25)
  }

  test("star subject variable remains joinable across groups") {
    // two stars over different tables, chained through a shared variable
    val q =
      """SELECT ?cname (COUNT(?o) AS ?n) WHERE {
        |  ?o <urn:g:orders#ref_customer> ?c .
        |  ?o <urn:g:orders#o_orderstatus> "O" .
        |  ?c <urn:g:customer#c_name> ?cname .
        |  ?c <urn:g:customer#c_acctbal> ?bal .
        |  FILTER(?bal > 5000)
        |} GROUP BY ?cname ORDER BY ?cname""".stripMargin
    val (fused, plain) = fusedAndPlain(Seq("orders", "customer"), q)
    assert(scanCount(fused) == 2, fused.queryExecution.executedPlan.toString)
    assert(rows(fused, "cname", "n") == rows(plain, "cname", "n"))
  }
}
