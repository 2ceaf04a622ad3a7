package graft

import graft.ops.TextAnalysis

/** Duplicate-span removal and bigram-LM perplexity on hand-computable corpora. */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("spanDedup keeps the global first occurrence of each span") {
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b c d e f"),
      (3L, "a b"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.spanDedup(d, "doc_id", "text", spanTokens = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq.sortBy(_._1)
    // doc1 owns "a b" and "c d"; doc2 keeps only its novel "e f"; doc3 is
    // fully duplicated (row survives with n_kept = 0); empty doc4 is dropped
    assert(got == Seq(
      (1L, 2, 2, "a b c d"),
      (2L, 3, 1, "e f"),
      (3L, 1, 0, "")))
  }

  test("spanDedup removes within-document repeats too") {
    val d = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.spanDedup(d, "doc_id", "text", spanTokens = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq((3, 2, "x y z")))
  }

  test("lmPerplexity matches the closed-form add-alpha bigram model") {
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // c1: a=3 b=2 c=1; T=6 V=3; c2: (a,b)=2 (a,c)=1
    val a = 0.5
    def pplOf(lps: Seq[Double]) = math.exp(-lps.sum / lps.size)
    val expect = Map(
      1L -> pplOf(Seq(math.log((3 + a) / (6 + a * 3)), math.log((2 + a) / (3 + a * 3)))),
      3L -> pplOf(Seq(math.log((3 + a) / (6 + a * 3)), math.log((1 + a) / (3 + a * 3)))))
    val got = TextAnalysis.lmPerplexity(d, "doc_id", "text", alpha = a)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.forall(_._2 == 2))
    assert(math.abs(got(0)._3 - expect(1L)) < 1e-6)
    assert(math.abs(got(1)._3 - expect(1L)) < 1e-6) // doc2 ≡ doc1
    assert(math.abs(got(2)._3 - expect(3L)) < 1e-6)
    // the rarer continuation (a,c) must score as higher perplexity
    assert(got(2)._3 > got(0)._3)
  }

  test("lmPerplexity handles single-token documents via the unigram term") {
    val d = Seq((1L, "a"), (2L, "a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.lmPerplexity(d, "doc_id", "text", alpha = 0.1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._1)
    assert(got == Seq((1L, 1), (2L, 4)))
  }

  test("mixtureSample: temperature rates are right and the sample is deterministic") {
    val d = (1L to 8L).map(i => (i, "A")).++(Seq((9L, "B"), (10L, "B")))
      .toDF("doc_id", "src")
    // tau = 0.5: w_A = sqrt(8), w_B = sqrt(2); target 5 rows
    val wA = math.sqrt(8.0); val wB = math.sqrt(2.0)
    val expectA = BigDecimal(5.0 * wA / (wA + wB) / 8.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectB = BigDecimal(5.0 * wB / (wA + wB) / 2.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.mixtureSample(d, "doc_id", "src",
      targetRows = 5, temperature = 0.5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(got.forall { case (_, s, r) => r == (if (s == "A") expectA else expectB) },
      s"rates wrong: $got (expect A=$expectA B=$expectB)")
    // tau = 0.5 upsamples the small stratum RELATIVE to proportional
    assert(expectB > expectA)
    val again = TextAnalysis.mixtureSample(d, "doc_id", "src",
      targetRows = 5, temperature = 0.5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(got == again)
    // a huge target caps every rate at 1.0 and keeps everything
    val all = TextAnalysis.mixtureSample(d, "doc_id", "src",
      targetRows = 1000, temperature = 0.5, salt = "t")
    assert(all.count() == 10 && all.select("rate").distinct().collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("mixtureSample: a null stratum is a stratum — sampled, not silently dropped") {
    val d = ((1L to 4L).map(i => (i, null: String)) ++ (5L to 8L).map(i => (i, "en")))
      .toDF("doc_id", "src")
    // target >= corpus: every rate caps at 1.0, so ALL 8 rows must come
    // back — with a non-null-safe join the 4 null rows vanish while the
    // null group's weight still deflated the real strata
    val all = TextAnalysis.mixtureSample(d, "doc_id", "src",
      targetRows = 100, temperature = 1.0, salt = "n")
    assert(all.count() == 8)
    assert(all.where(all("src").isNull).count() == 4)
  }
}
