package graft

import graft.ops.{Similarity, TextAnalysis, Urls}
import org.apache.spark.sql.functions._

/** URL canonicalization/dedup, Gopher-rule heuristic filtering, SemDeDup. */
class UrlsFilterSemdedupSpec extends SparkSpec {

  import spark.implicits._

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("u").select(Urls.canonicalize(col("u"))).as[String].collect().head

  test("canonicalize: case, www, default port, tracking params, fragment, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag") ==
      "https://example.com/a/b?a=1&b=2")
    assert(canon("http://example.com:80") == "http://example.com/")
    assert(canon("http://example.com:8080/x") == "http://example.com:8080/x")
    assert(canon("example.com/x/") == "http://example.com/x")
    assert(canon("https://example.com/?fbclid=abc&gclid=1&ref=rss") == "https://example.com/")
    assert(canon("https://example.com/p?ref=rss&refresh=1") == "https://example.com/p?refresh=1")
    assert(canon("ftp://Example.com:80/f") == "ftp://example.com:80/f")
  }

  test("canonicalize: unparseable scheme falls back to the input verbatim, no cross-collapse") {
    assert(canon("1http://Broken.example/A") == "1http://Broken.example/A")
    assert(canon("2ftp://Other.example/B") == "2ftp://Other.example/B")
    // case-distinct malformed URLs stay distinct (the valid branch keeps
    // path case too; lowercasing everything here would wrongly dedup them)
    assert(canon("1http://x/A") != canon("1http://x/a"))
  }

  test("canonicalize: protocol-relative //host gets a scheme and a real authority") {
    assert(canon("//WWW.Example.com/a/") == "http://example.com/a")
    // must dedup with the absolute form
    assert(canon("//www.example.com/a") == canon("http://example.com/a"))
  }

  test("shuffleShards spreads across more than 256 shards") {
    val df = (0L until 4000L).toDF("doc_id")
    val shards = TextAnalysis.shuffleShards(df, "doc_id", nShards = 1024, salt = "wide")
      .select("shard").distinct().count()
    assert(shards > 900, s"expected near-1024 distinct shards, got $shards")
  }

  test("urlDedup keeps the lowest id per canonical group") {
    val df = Seq(
      (3L, "https://example.com/a?x=1&y=2"),
      (1L, "https://www.example.com/a/?y=2&x=1&utm_source=s"),
      (2L, "https://example.com/b")).toDF("id", "url")
    val out = Urls.urlDedup(df, "id", "url").orderBy("id")
      .select("id", "keep").as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, true), (2L, true), (3L, false)))
  }

  test("heuristicFilter metrics and rules fire per stratum") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog in the sun"), // clean
      (2L, "words and the stuff # # # # # # # # # # # #"), // symbol-heavy
      (3L, "- one\n- two\n- three\nthe rest of it"), // bullets
      (4L, "the story begins...\nand it continues…"), // ellipsis lines
      (5L, "12 34 56 78 90 11 22"), // no alpha
      (6L, "a b") // too short
    ).toDF("doc_id", "text")
    val r = TextAnalysis.heuristicFilter(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(r(1L))
    assert(!r(2L)); assert(!r(3L)); assert(!r(4L)); assert(!r(5L)); assert(!r(6L))
    val m = TextAnalysis.heuristicFilter(docs, "doc_id", "text").orderBy("doc_id").collect()
    val row3 = m(2)
    assert(row3.getAs[Double]("bullet_ratio") == 0.75)
    val row5 = m(4)
    assert(row5.getAs[Double]("alpha_ratio") == 0.0)
    assert(row5.getAs[Int]("stop_hits") == 0)
  }

  test("ngramStats: top-k per group, count-desc then ngram-asc ties, short docs yield none") {
    val docs = Seq(
      (1L, "g1", "a b a b a b"), // "a b"×3, "b a"×2
      (2L, "g1", "a b c"), // "a b", "b c"
      (3L, "g1", "x"), // too short for a bigram
      (4L, "g2", "p q")).toDF("id", "grp", "text")
    val out = TextAnalysis.ngramStats(docs, "grp", "text", n = 2, topK = 2)
      .orderBy("grp", "ngram").as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("g1", "a b", 4L), ("g1", "b a", 2L), ("g2", "p q", 1L)))
  }

  test("corpusReport aggregates volumes and mean quality per (source, lang)") {
    val docs = Seq(
      (1L, "s1", "en", "the cat sat on the mat"),
      (2L, "s1", "en", "a dog ran"),
      (3L, "s1", "de", "der hund"),
      (4L, "s2", "en", "hello world")).toDF("id", "src", "lng", "text")
    val out = TextAnalysis.corpusReport(docs, "src", "lng", "text")
      .orderBy("src", "lng").collect()
    assert(out.length == 3)
    val s1en = out(1)
    assert(s1en.getAs[Long]("docs") == 2 && s1en.getAs[Long]("tokens") == 9)
    assert(s1en.getAs[Long]("chars") == 22 + 9)
    assert(s1en.getAs[Double]("avg_quality") > 0.0 && s1en.getAs[Double]("avg_quality") <= 1.0)
  }

  test("shuffleShards: a permutation — every row exactly once, dense positions per shard, stable across runs") {
    val df = (0L until 200L).toDF("doc_id")
    val out = TextAnalysis.shuffleShards(df, "doc_id", nShards = 8, salt = "s1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._1).sorted.toSeq == (0L until 200L))
    // positions within each shard are 0..n-1 dense
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length))
    }
    // deterministic: a second evaluation gives the identical assignment
    val again = TextAnalysis.shuffleShards(df, "doc_id", nShards = 8, salt = "s1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different salt yields a different permutation
    val other = TextAnalysis.shuffleShards(df, "doc_id", nShards = 8, salt = "s2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq != other.sortBy(_._1).toSeq)
  }

  test("semDedup drops the higher id of a near-identical pair, keeps distant vectors") {
    // two tight pairs in well-separated regions; seeds (the 2 lowest ids)
    // are one per region so each pair converges into one cluster
    def v(base: Double, eps: Double) = Array.tabulate(4)(i => base + (if (i == 0) eps else 0.0))
    val df = Seq(
      (1L, v(1.0, 0.0)), (11L, v(1.0, 0.001)), // near-dup pair, region A
      (2L, v(-5.0, 0.0)), (12L, v(-5.0, 0.002)) // near-dup pair, region B
    ).toDF("id", "vec")
    val out = Similarity.semDedup(df, "id", "vec", k = 2, iters = 2, minCosine = 0.999)
      .orderBy("id").select("id", "keep").as[(Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 11L, 12L))
    val keep = out.toMap
    assert(keep(1L) && !keep(11L), "higher id of the region-A pair drops")
    assert(keep(2L) && !keep(12L), "higher id of the region-B pair drops")
  }

  test("semDedup keeps opposite vectors sharing a cluster (cosine -1)") {
    val df = Seq((1L, Array(9.0, -9.0)), (2L, Array(-9.0, 9.0))).toDF("id", "vec")
    val keep = Similarity.semDedup(df, "id", "vec", k = 1, iters = 1, minCosine = 0.3)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep == Map(1L -> true, 2L -> true))
  }

  test("semDedup triangle chunking (skew cap) is result-identical at any chunk size") {
    // real embeddings, cap forced to 1 row per chunk → maximum splitting
    // (m = cluster size, every pair meets via a cross-chunk key); must
    // equal the default single-chunk-per-cluster output exactly
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(): Seq[(Long, Int, Boolean)] =
      Similarity.semDedup(emb, "vec_id", "embedding", k = 4, iters = 2, minCosine = 0.3)
        .orderBy("id").select("id", "cluster", "keep")
        .as[(Long, Int, Boolean)].collect().toSeq
    val base = run()
    val old = sys.props.put("graft.semdedup.maxClusterRows", "1")
    try {
      val split = run()
      assert(split == base, "chunked pair join must be pair-complete and duplicate-free")
    } finally {
      old match {
        case Some(v) => sys.props.put("graft.semdedup.maxClusterRows", v)
        case None => sys.props.remove("graft.semdedup.maxClusterRows")
      }
    }
  }

  test("semDedup dominance rule is non-chained: dropped doc still shadows later ones") {
    // angles 0, 0.03, 0.06 rad: cos(0.03) ≈ 0.99955 ≥ 0.999 but
    // cos(0.06) ≈ 0.9982 < 0.999 — so 3 is dropped ONLY because of the
    // already-dropped 2 (1~2 close, 2~3 close, 1~3 not)
    def u(theta: Double) = Array(math.cos(theta), math.sin(theta))
    val df = Seq((1L, u(0.0)), (2L, u(0.03)), (3L, u(0.06))).toDF("id", "vec")
    val keep = Similarity.semDedup(df, "id", "vec", k = 1, iters = 1, minCosine = 0.999)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep == Map(1L -> true, 2L -> false, 3L -> false))
  }
}
