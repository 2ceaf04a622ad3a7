package graft

import graft.ops.TextAnalysis

/** TF-IDF weighting and BM25 ranking on hand-computable corpora. */
class TfIdfSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")

  test("tf counts and smooth idf weights") {
    val rows = TextAnalysis.tfIdf(docs, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(x => (x._1, x._2))
    // N=3; df: apple 1, banana 2, cherry 2, durian 1
    def w(tf: Long, df: Long) = BigDecimal(tf * (math.log(4.0 / (df + 1.0)) + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows == Seq(
      (1L, "apple", 2L, w(2, 1)), (1L, "banana", 1L, w(1, 2)),
      (2L, "banana", 1L, w(1, 2)), (2L, "cherry", 1L, w(1, 2)),
      (3L, "cherry", 3L, w(3, 2)), (3L, "durian", 1L, w(1, 1))))
  }

  test("topK keeps the highest-weighted terms, ties broken by term") {
    val rows = TextAnalysis.tfIdf(docs, "doc_id", "text", topK = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    // doc 2: banana and cherry tie (same tf, same df) -> banana wins lexically
    assert(rows == Seq((1L, "apple"), (2L, "banana"), (3L, "cherry")))
  }

  test("tfIdf and bm25 are lazy and tolerate an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // construction must not run a job or NPE on the null avg aggregate
    val t = TextAnalysis.tfIdf(empty, "doc_id", "text")
    val b = TextAnalysis.bm25(empty, "doc_id", "text", Seq("x"))
    assert(t.count() == 0 && b.count() == 0)
  }

  test("bm25 ranks the term-dense doc first; docs without query terms are absent") {
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == Seq(3L, 2L)) // tf 3 beats tf 1; doc 1 has no cherry
    assert(got.forall(_._2 > 0))
  }

  test("bm25 multi-term scores sum per document") {
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("apple", "durian"), topK = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got.toSet == Set(1L, 3L))
  }

  test("packing: running offsets cut into capacity bins, shard-local") {
    // one shard so the running order is just doc_id; token counts 3,2,4
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text",
        capacity = 4, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq.sortBy(_._1)
    // starts: 0, 3, 5 -> bins 0, 0, 1; offsets 0, 3, 1 (doc 2 straddles bins 0/1)
    assert(packed == Seq((1L, 0, 0L, 0L, 3), (2L, 0, 0L, 3L, 2), (3L, 0, 1L, 1L, 4)))
  }

  test("packing: empty docs dropped; bins globally unique across shards") {
    import spark.implicits._
    val d = (Seq((10L, ""), (11L, "a b c"), (12L, "d e")) ++
      (20L to 40L).map(i => (i, s"w$i x y z"))).toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(d, "doc_id", "text", capacity = 8, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(!packed.exists(_._1 == 10L))
    // bin ids embed the shard: no two shards share a bin id
    val byBin = packed.groupBy(_._3).values
    assert(byBin.forall(g => g.map(_._2).distinct.size == 1))
  }
}
