package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Dedup

/** Dedup pipelines; the oracle gate covers the driver queries end-to-end,
  * these specs pin algorithm-level equivalences the gate can't see. */
class DedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered jaccard equals the inverted-index join exactly") {
    val t = 0.6
    val inv = pairSet(Dedup.jaccardPairs(docs, "doc_id", "text", t, shingleK = 3))
    val pre = pairSet(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", t, shingleK = 3))
    assert(pre == inv, s"prefix=${pre.size} inverted=${inv.size}")
    assert(inv.nonEmpty) // the corpus contains near-dups; empty would be vacuous
  }

  test("prefix filter is lossless at a tight threshold boundary") {
    import spark.implicits._
    // J(1,2) = 4/6 = 2/3 exactly at threshold 2/3 — the ⌈t·sz⌉ boundary
    // where a carelessly-rounded prefix length would drop the pair
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d f"),
      (3L, "x y z q r")).toDF("doc_id", "text")
    val pre = pairSet(Dedup.jaccardPairsPrefix(df, "doc_id", "text", 2.0 / 3))
    val inv = pairSet(Dedup.jaccardPairs(df, "doc_id", "text", 2.0 / 3))
    assert(pre == inv)
    assert(pre.exists { case (a, b, j) => a == 1L && b == 2L && math.abs(j - 2.0 / 3) < 1e-5 })
  }
}
