package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis, Urls}

/**
 * Scale probe for the training-data pipeline ops: synthesises a document
 * corpus ~40× the sf0.1 gate corpus (near-dup-rich, Zipf-ish vocabulary so
 * hot shingles exist) plus an embedding corpus, and times the headline
 * pipelines. The point is the growth SHAPE: all candidate generation is
 * equi-join keyed (tokens/bands/buckets), so runtimes should scale
 * near-linearly with corpus size — a quadratic regression shows up here
 * long before it shows up at 100 TB.
 *
 * Run: sbt "runMain graft.tools.OpsScaleProbe [nDocs] [nVecs]"
 */
object OpsScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val nVecs = args.lift(1).map(_.toInt).getOrElse(100000)
    // honours SPARK_GRAFT_CPUS so core-scaling ratios (8 vs 32) can be
    // measured at a data-bound size (r9 verdict item 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic docs: base sentence per cluster of ~4, with
    // word substitutions — near-dup-rich like a crawl with mirrored pages
    val docs: DataFrame = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map { w =>
        val base = conv(substring(md5(concat(lit(s"w$w|"), (col("id") / 4).cast("long").cast("string"))), 1, 4), 16, 10) % 500
        // every 4th doc mutates ~3 of its 40 words
        val mut = conv(substring(md5(concat(lit(s"m$w|"), col("id").cast("string"))), 1, 4), 16, 10) % 500
        when(col("id") % 4 =!= 0 && lit(w) % 13 === (col("id") % 13), concat(lit("t"), mut))
          .otherwise(concat(lit("t"), base))
      }: _*).as("text")).localCheckpoint()
    println(s"[ops] corpus: ${docs.count()} docs")

    val vecs: DataFrame = spark.range(nVecs).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)),
        i => ((conv(substring(md5(concat(col("id").cast("string"), lit("|"), i)), 1, 6), 16, 10)
          .cast("double") / 16777215.0) * 2 - 1).cast("float")).as("embedding"),
      (col("id") % 10).cast("string").as("label")).localCheckpoint()
    println(s"[ops] embeddings: ${vecs.count()} x 32")

    def time(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = mk.count()
      println(f"[ops] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.1f s rows $n")
    }

    time("dedup_exact")(Dedup.exact(docs, "doc_id", "text"))
    time("minhash_lsh_pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5, shingleK = 3))
    time("jaccard_prefix(0.8)")(Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
      threshold = 0.8, shingleK = 3))
    time("simhash_pairs")(Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3))
    time("clusters(from minhash)") {
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.5, shingleK = 3)
      Dedup.clusters(docs, "doc_id", pairs)
    }
    time("chunk(512/64)")(TextAnalysis.chunk(docs, "doc_id", "text", size = 32, overlap = 4))
    time("quality")(TextAnalysis.quality(docs, "doc_id", "text"))
    time("lang_id")(TextAnalysis.langId(docs, "doc_id", "text"))
    time("centroids")(Similarity.centroids(vecs, "label", "embedding"))
    time("ann_ivf_topk")(Similarity.ivfTopK(vecs, "vec_id", "embedding",
      queryId = 7L, k = 10, nClusters = 32, nProbe = 4))
    time("ann_ivf_batch(1k queries)") {
      val queries = spark.range(1000).select((col("id") * 97 % nVecs).as("vec_id"))
      Similarity.ivfTopKAll(vecs, "vec_id", "embedding", queries, "vec_id",
        k = 10, nClusters = 32, nProbe = 4)
    }
    // round-6 additions — each should stay linear-ish in corpus size:
    // tf-idf/perplexity shuffles are keyed by term/bigram (vocab-bounded
    // small sides), span-dedup by span content, packing is a per-shard
    // cumsum, url dedup one shuffle on the canonical URL, kmeans/semdedup
    // narrow assignment maps + cluster-keyed pair joins
    time("tfidf(top5)")(TextAnalysis.tfIdf(docs, "doc_id", "text", topK = 5))
    time("span_dedup(16)")(TextAnalysis.spanDedup(docs, "doc_id", "text", spanTokens = 16))
    time("lm_perplexity")(TextAnalysis.lmPerplexity(docs, "doc_id", "text"))
    time("pack(2048)")(TextAnalysis.packSequences(docs, "doc_id", "text",
      capacity = 2048, nShards = 64))
    time("heuristic_filter")(TextAnalysis.heuristicFilter(docs, "doc_id", "text"))
    time("url_dedup") {
      val urls = docs.select(col("doc_id"), concat(lit("https://h"),
        (col("doc_id") % 5000).cast("string"), lit(".example.org/p/"),
        (col("doc_id") % 97).cast("string"), lit("?utm_source=x&q="),
        (col("doc_id") % 7).cast("string")).as("url"))
      Urls.urlDedup(urls, "doc_id", "url")
    }
    time("kmeans(k=64,3 iters)")(Similarity.kmeansAssign(vecs, "vec_id", "embedding",
      k = 64, iters = 3))
    time("semdedup(k=64)")(Similarity.semDedup(vecs, "vec_id", "embedding",
      k = 64, iters = 2, minCosine = 0.95))
    time("html_extract")(graft.ops.Html.extract(
      graft.ops.Html.syntheticPage(docs, "doc_id", "text"), "doc_id", "html"))
    time("warc_parse")(graft.sources.Warc.records(
      graft.sources.Warc.syntheticWarc(docs, "doc_id", "text"), "doc_id", "warc"))
    // temporal joins: one event per doc spread over ~nDocs seconds across
    // 1000 keys; as-of = one shuffle + window, interval = bin equi-join.
    val events = spark.range(nDocs).select(
      col("id").as("event_id"), (col("id") % 1000).as("key"),
      timestamp_seconds(lit(1700000000L) + col("id") * 7 % (nDocs / 2)).as("ts"),
      (col("id") % 100).cast("double").as("value"),
      when(col("id") % 3 === 0, "left").otherwise("right").as("side")).localCheckpoint()
    time("asof_join") {
      graft.ops.TemporalJoins.asofJoin(
        events.where(col("side") === "left").drop("side"),
        events.where(col("side") === "right").drop("side"),
        Seq("key"), "ts", "ts", Seq("value"))
    }
    time("interval_join(10min bins)") {
      val iv = events.where(col("side") === "left" && col("event_id") % 50 === 0)
        .select(col("event_id").as("iv_id"), col("ts").as("s"),
          timestamp_seconds(unix_timestamp(col("ts")) + 600).as("e"))
      graft.ops.TemporalJoins.intervalJoin(
        events.select(col("event_id"), col("ts")), "ts", iv, "s", "e", binSeconds = 600L)
    }
    // round-6 late additions: pagerank iterations are edges⋈ranks
    // equi-joins (edges ~3x nodes here, hubs get ~0.1% of in-links);
    // line dedup shuffles once by line content (boilerplate = hot keys,
    // map-side combinable); BPE corpus work is the word histogram + one
    // distinct-word segmentation + word-keyed join back; classifier is an
    // explode + broadcast join + doc-keyed agg
    time("pagerank(5 iters)") {
      val edges = spark.range(nDocs).select(col("id").as("src"),
          explode(sequence(lit(1), lit(3))).as("j"))
        .select(col("src"),
          when(col("j") === 1, (col("src") * 31 + 7) % nDocs)
            .when(col("j") === 2, (col("src") * 17 + 3) % nDocs)
            .otherwise(col("src") % 1000) // 1000 hub pages soak most links
            .as("dst"))
        .where(col("dst") =!= col("src"))
      graft.ops.LinkGraph.pageRank(edges, "src", "dst", iters = 5)
    }
    time("line_dedup") {
      val lined = docs.select(col("doc_id"),
        regexp_replace(col("text"), " (t\\d+ t\\d+ t\\d+) ", " $1\n").as("text"))
      TextAnalysis.lineDedup(lined, "doc_id", "text")
    }
    time("bpe(learn 50 + encode)")(
      graft.ops.Bpe.learnAndEncode(docs, "doc_id", "text", nMerges = 50))
    time("linear_classifier") {
      val w = TextAnalysis.pseudoWeights(spark, 4096)
      TextAnalysis.linearScore(docs, "doc_id", "text", w, 4096)
    }
    time("normalize_nfkc")(TextAnalysis.normalizeText(docs, "doc_id", "text", "NFKC"))
    // media decoders: partition-local narrow maps — synth + decode per row,
    // no shuffle anywhere, so these must scale embarrassingly linearly
    val ids = spark.range(nDocs).select(col("id").as("doc_id")).localCheckpoint()
    import graft.ops.Multimodal
    time("adpcm_decode")(Multimodal.extractWavFeatures(
      Multimodal.syntheticAdpcmWav(ids, "doc_id")))
    time("avi_frames_decode")(Multimodal.extractAviFrames(
      Multimodal.syntheticAvi(ids, "doc_id")))
    time("mp4_meta_probe")(Multimodal.extractMp4Meta(
      Multimodal.syntheticMp4(ids, "doc_id")))
    time("ogg_meta_probe")(Multimodal.extractOggMeta(
      Multimodal.syntheticOgg(ids, "doc_id")))
    time("mp3_meta_probe")(Multimodal.extractMp3Meta(
      Multimodal.syntheticMp3(ids, "doc_id")))
    time("h264_meta_probe")(Multimodal.extractH264Meta(
      Multimodal.syntheticH264(ids, "doc_id")))
    spark.stop()
  }
}
