package graft

import graft.ops.TextAnalysis

/** PII redaction cascade and repetition quality metrics. */
class PiiRepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def scrub(text: String): (Int, Int, Int, String) = {
    val r = TextAnalysis.piiScrub(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
  }

  test("email is counted and redacted") {
    assert(scrub("mail me at jane.doe+x@sub.example.co today") ==
      ((1, 0, 0, "mail me at [EMAIL] today")))
  }

  test("international phone is counted and redacted") {
    assert(scrub("call +1 555-012 4321 now") == ((0, 1, 0, "call [PHONE] now")))
    assert(scrub("call +44 555 0123-4321 now") == ((0, 1, 0, "call [PHONE] now")))
  }

  test("bare IPv4 is counted and redacted") {
    assert(scrub("from 10.0.3.7 and 203.0.113.9.") == ((0, 0, 2, "from [IP] and [IP].")))
  }

  test("version strings with word boundaries inside are left alone only when not IP-shaped") {
    // 1.2.3.4 IS IP-shaped; 1.2.3 is not (three octets)
    assert(scrub("v 1.2.3 released") == ((0, 0, 0, "v 1.2.3 released")))
  }

  test("counts match clean_text placeholders when the phone pass creates an IP boundary") {
    // the phone match consumes '5555', leaving '[PHONE]1.2.3.4' where ']'
    // provides the \b the IP pattern needs — n_ips must see the SAME text
    // the cascade redacts, so count and placeholder agree (both 1)
    val (e, p, i, clean) = scrub("call +1 555 555 55551.2.3.4")
    assert((e, p) == ((0, 1)) && clean == "call [PHONE][IP]")
    assert(i == 1, s"n_ips=$i must equal the one [IP] in '$clean'")
  }

  test("email whose domain ends in an alpha TLD swallows an embedded IP — cascade order") {
    // the whole token is one email match; the IP inside must NOT be double-counted
    assert(scrub("bob@10.0.0.7.net wrote") == ((1, 0, 0, "[EMAIL] wrote")))
  }

  test("IP-only domain is not an email (TLD must be alphabetic) — IP pass takes it") {
    val (e, p, i, t) = scrub("bob@10.0.0.7 wrote")
    assert(e == 0 && i == 1 && t.endsWith("[IP] wrote"))
  }

  test("all three kinds in one document") {
    assert(scrub("a@b.com +1 555-012 4321 10.0.0.1") == ((1, 1, 1, "[EMAIL] [PHONE] [IP]")))
  }

  private def rep(text: String): (Int, Double, Double, Double) = {
    val r = TextAnalysis.repetition(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("all-distinct words: uniq 1, dup-bigram 0, top share 1/n") {
    assert(rep("alpha beta gamma delta") == ((4, 1.0, 0.0, 0.25)))
  }

  test("degenerate repetition: one word repeated") {
    // 5 words, 1 distinct; 4 bigrams all equal -> dup ratio 0.75; top share 1
    assert(rep("spam spam spam spam spam") == ((5, 0.2, 0.75, 1.0)))
  }

  test("mixed: normalisation lowercases and strips punctuation") {
    // tokens: the, cat, the, cat -> n=4, uniq 0.5, bigrams [the cat, cat the,
    // the cat] -> distinct 2/3, top share 2/4
    val (n, u, d, t) = rep("The cat; the CAT!")
    assert(n == 4 && u == 0.5 && t == 0.5)
    assert(math.abs(d - (1.0 - 2.0 / 3)) < 1e-6)
  }

  test("empty and single-word docs have zero ratios") {
    assert(rep("") == ((0, 0.0, 0.0, 0.0)))
    assert(rep("word") == ((1, 1.0, 0.0, 1.0)))
  }
}
