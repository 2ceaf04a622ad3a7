package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Dedup

/**
 * Randomised differential tests: each optimised distributed pipeline is
 * checked bit-exact against either a naive driver-side reference
 * implementation or a semantically-equal unoptimised pipeline, over
 * generated corpora with heavy near-duplication (fixed seeds — reproducible).
 */
class DedupDifferentialSpec extends SparkSpec {

  import spark.implicits._

  /** Synthetic corpus: clusters of mutated copies — near-dup-rich by
    * construction, with stopword-heavy vocabulary to stress hot tokens. */
  private def corpus(seed: Int, nBase: Int = 18, maxCopies: Int = 4): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("the", "of", "and", "data", "spark", "quad", "engine",
      "alpha", "beta", "gamma", "delta", "query", "join", "scan", "store")
    def doc(): Vector[String] = Vector.fill(8 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    (1 to nBase).foreach { _ =>
      val base = doc()
      docs += ((id, base.mkString(" "))); id += 1
      (0 until rnd.nextInt(maxCopies)).foreach { _ =>
        // mutate: swap a token or append one
        val m = if (rnd.nextBoolean() && base.size > 2)
          base.updated(rnd.nextInt(base.size), vocab(rnd.nextInt(vocab.size)))
        else base :+ vocab(rnd.nextInt(vocab.size))
        docs += ((id, m.mkString(" "))); id += 1
      }
    }
    docs.toSeq.toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet

  test("prefix-filtered Jaccard equals the inverted-index join (lossless)") {
    for (seed <- Seq(1, 2); t <- Seq(0.5, 0.7, 0.9)) {
      val c = corpus(seed).localCheckpoint()
      val a = pairSet(Dedup.jaccardPairs(c, "doc_id", "text", t, shingleK = 2))
      val b = pairSet(Dedup.jaccardPairsPrefix(c, "doc_id", "text", t, shingleK = 2))
      assert(a == b, s"seed=$seed t=$t: prefix=${b.size} inverted=${a.size}")
    }
  }

  test("inverted-index Jaccard equals naive driver computation") {
    val c = corpus(3)
    val local = c.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        .sliding(2).map(_.mkString(" ")).toSet).toMap
    val expect = (for {
      a <- local.keys; b <- local.keys if a < b
      inter = (local(a) & local(b)).size
      if inter > 0
      j = inter.toDouble / (local(a) | local(b)).size
      if j >= 0.5
    } yield (a, b)).toSet
    val got = pairSet(Dedup.jaccardPairs(c, "doc_id", "text", 0.5, shingleK = 2))
      .map(p => (p._1, p._2))
    assert(got == expect)
  }

  test("simhash chunk candidates are complete for the pigeonhole bound (both schemes)") {
    val c = corpus(4).localCheckpoint()
    // brute force: all pairs of driver-collected signatures with dist<=3
    val sigs = Dedup.simhash(c, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if d <= 3
    } yield (a, b, d)).toSet
    def run(): Set[(Long, Long, Int)] =
      Dedup.simhashPairs(c, "doc_id", "text", maxDist = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // default: 4×15-bit single-chunk keys (corpus below the Manku crossover)
    assert(run() == expect)
    // forced: Manku 6-block/choose-3 keys — must be lossless too
    sys.props("graft.simhash.mankuMinRows") = "1"
    try assert(run() == expect)
    finally sys.props.remove("graft.simhash.mankuMinRows")
  }

  test("clusters partition the corpus consistently with the pair graph") {
    val c = corpus(5).localCheckpoint()
    val pairs = Dedup.minhashLshPairs(c, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5, shingleK = 2).localCheckpoint()
    val cl = Dedup.clusters(c, "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every pair's endpoints share a cluster; cluster id = min member
    pairs.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(cl(a) == cl(b), s"pair ($a,$b) split across clusters")
    }
    cl.groupBy(_._2).foreach { case (comp, members) =>
      assert(comp == members.keys.min, s"cluster $comp is not its min member")
    }
    assert(cl.size == c.count())
  }
}
