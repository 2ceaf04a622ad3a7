package graft

import graft.ops.TextAnalysis

/** Fixed-size token chunking: boundary arithmetic, overlap stitching, and
  * degenerate inputs. */
class ChunkSpec extends SparkSpec {

  import spark.implicits._

  private def chunksOf(text: String, size: Int = 8, overlap: Int = 2): Seq[(Int, String, Int)] =
    TextAnalysis.chunk(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", size, overlap)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq.sortBy(_._1)

  test("short doc yields one whole chunk") {
    assert(chunksOf("one two three") == Seq((0, "one two three", 3)))
  }

  test("exact fit yields one chunk, no phantom tail") {
    val words = (1 to 8).map(i => s"w$i").mkString(" ")
    assert(chunksOf(words) == Seq((0, words, 8)))
  }

  test("overlap stitches consecutive chunks") {
    val words = (1 to 14).map(i => s"w$i")
    val cs = chunksOf(words.mkString(" "))
    // step = 6: chunk0 = w1..w8, chunk1 = w7..w14
    assert(cs == Seq((0, words.take(8).mkString(" "), 8),
                     (1, words.slice(6, 14).mkString(" "), 8)))
  }

  test("final chunk may be short; every token covered") {
    val words = (1 to 17).map(i => s"w$i")
    val cs = chunksOf(words.mkString(" "))
    assert(cs.map(_._3) == Seq(8, 8, 5))
    // last chunk = w13..w17
    assert(cs.last._2 == words.slice(12, 17).mkString(" "))
    val covered = cs.flatMap(_._2.split(" ")).toSet
    assert(covered == words.toSet)
  }

  test("empty and punctuation-only docs yield no chunks") {
    assert(chunksOf("").isEmpty)
    assert(chunksOf("!!! ... ???").isEmpty)
  }

  test("tokenisation is case-folded and splits on non-alphanumerics") {
    assert(chunksOf("Hello, WORLD!") == Seq((0, "hello world", 2)))
  }

  test("invalid parameters rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chunk(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        size = 4, overlap = 4)
    }
  }
}
