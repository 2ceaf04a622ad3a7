package graft

import graft.ops.Bpe
import graft.ops.Bpe.Merge

/** BPE merge learning + encoding: hand-checked merges, tiebreaks,
  * greedy-left application, OOV generalization, vocab cap. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def enc(docs: Seq[(Long, String)], merges: Seq[Merge]): Map[Long, (Int, Int, String)] =
    Bpe.encode(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap

  test("learnMerges: frequency order then lexicographic tiebreak") {
    val df = Seq((1L, "ab ab ac")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(df, "text", 2) ==
      Seq(Merge(0, "a", "b"), Merge(1, "a", "c")))
    val tie = Seq((1L, "xy yz")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(tie, "text", 1) == Seq(Merge(0, "x", "y")))
  }

  test("learnMerges stops early when no pairs remain") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text") // all single-char words
    assert(Bpe.learnMerges(df, "text", 5).isEmpty)
  }

  test("merge application is greedy leftmost non-overlapping") {
    val df = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(df, "text", 1)
    assert(ms == Seq(Merge(0, "a", "a")))
    val out = enc(Seq((1L, "aaa")), ms)
    assert(out(1L) == ((1, 2, "aa a")))
  }

  test("encode reproduces training segmentation and generalizes to OOV words") {
    val train = Seq((1L, "ab ab ac")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(train, "text", 2)
    val out = enc(Seq((1L, "ab ac"), (2L, "abc"), (3L, "???")), ms)
    assert(out(1L) == ((2, 2, "ab ac"))) // both words in-vocab, fully merged
    assert(out(2L) == ((1, 2, "ab c"))) // OOV: (a,b) applies, then no " a c "
    assert(out(3L) == ((0, 0, "")))     // no tokens at all
  }

  test("maxVocab cap silences tail words during training but still encodes them") {
    // 'zz' is the tail word (count 1); cap=1 keeps only 'ab' (count 3)
    val df = Seq((1L, "ab ab ab zz")).toDF("doc_id", "text")
    val ms = Bpe.learnMerges(df, "text", 2, maxVocab = 1)
    assert(ms == Seq(Merge(0, "a", "b"))) // (z,z) never voted
    val out = enc(Seq((1L, "ab zz")), ms)
    assert(out(1L) == ((2, 3, "ab z z")))
  }

  test("learnAndEncode end-to-end on a multi-doc corpus") {
    val docs = Seq((1L, "low low lower"), (2L, "lowest low"))
    val df = docs.toDF("doc_id", "text")
    val ms = Bpe.learnMerges(df, "text", 3)
    // vocab: low:3 lower:1 lowest:1. pairs r1: (l,o):5 (o,w):5 ... tie
    // (l,o)<(o,w) -> merge (l,o); r2: (lo,w):5 -> low; r3: (low,e):2
    assert(ms == Seq(Merge(0, "l", "o"), Merge(1, "lo", "w"), Merge(2, "low", "e")))
    val out = Bpe.learnAndEncode(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "low low lowe r")
    assert(out(2L) == "lowe s t low")
  }
}
