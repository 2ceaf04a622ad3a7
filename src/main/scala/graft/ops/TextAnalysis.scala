package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for training-data pipelines: quality scoring,
 * language identification, token counting, fingerprinting. All pure column
 * expressions over one scan — no shuffle except the final aggregations.
 */
object TextAnalysis {

  /** Whitespace tokens (column-level). */
  private def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Canonical normalised token stream shared by the whole curation family
    * (chunking, span dedup, tf-idf, BM25, packing, repetition, perplexity)
    * AND their DuckDB oracles: lowercase, maximal letter/digit runs. Any
    * change here must land in the oracle SQL in lockstep. */
  private[graft] def normTokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Adjacent-pair (bigram) array over token array `w` of size `n`, built
    * from aligned slices (sequence() would count DOWN for n<2); `f` combines
    * each pair, `emptyType` types the n<2 empty array. */
  private def bigramsWith(w: Column, n: Column, f: (Column, Column) => Column,
                          emptyType: String): Column =
    when(n >= 2, zip_with(slice(w, lit(1), greatest(n - 1, lit(1))),
                          slice(w, lit(2), greatest(n - 1, lit(1))), f))
      .otherwise(array().cast(emptyType))

  /** BPE-ish subword count: word fragments of ≤4 chars + punctuation, the
    * usual cheap proxy for LLM token count. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{L}{1,4}|\\p{N}{1,3}|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** The quality metric columns over a text column (shared by [[quality]]
    * and [[corpusReport]] so the report needs no per-doc re-join). */
  private def qualityCols(t: Column): Seq[Column] = {
    val tokens = toks(t)
    val nTok = size(tokens)
    // ASCII punctuation spelled out (not \p{Punct}) so the DuckDB-RE2 oracle
    // can use the identical class
    val punct = size(regexp_extract_all(t, lit("[!-/:-@\\[-`{-~]"), lit(0)))
    val stop = size(filter(tokens, w => lower(w).isin("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")))
    Seq(length(t).as("n_chars"),
      nTok.as("n_tokens"),
      bpeishTokenCount(t).as("n_bpeish"),
      round(punct / greatest(length(t), lit(1)).cast(DoubleType), 6).as("punct_ratio"),
      round(stop / greatest(nTok, lit(1)).cast(DoubleType), 6).as("stopword_ratio"),
      round(length(t) / greatest(nTok, lit(1)).cast(DoubleType), 6).as("avg_token_len"))
  }

  /** Per-document quality metrics. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: qualityCols(col(textCol)): _*)

  /** The [0,1] quality-score expression over the metric columns. */
  private def scoreCol: Column =
    round(least(lit(1.0),
      (least(col("n_tokens"), lit(100)) / 100.0) * 0.5 +
        (lit(1.0) - least(col("punct_ratio") * 5, lit(1.0))) * 0.25 +
        least(col("stopword_ratio") * 4, lit(1.0)) * 0.25), 6)

  /** Quality score in [0,1] combining the metrics (weights are heuristic). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    quality(df, idCol, textCol).withColumn("score", scoreCol)

  /** Language marker words (tiny per-language stopword seed sets). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /**
   * N-gram-heuristic language ID: score each language by marker-token hits,
   * pick the best (ties broken lexicographically); no hits → 'und'.
   * One explode + small broadcast join + argmax window.
   */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val markers = spark.createDataFrame(
      langMarkers.toSeq.flatMap { case (l, ws) => ws.map(w => (w, l)) }).toDF("tok", "cand")
    val words = df.select(col(idCol).as("id"), explode(toks(lower(col(textCol)))).as("tok"))
    val scored = words.join(broadcast(markers), Seq("tok"))
      .groupBy("id", "cand").agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy("id").orderBy(col("hits").desc, col("cand").asc)
    val best = scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id"), col("cand").as("lang_pred"), col("hits"))
    // derived aggregates have no usable stats -> hint off SortMergeJoin
    df.select(col(idCol).as("id")).join(Joins.shuffleHashUnlessSmall(best), Seq("id"), "left")
      .select(col("id"), coalesce(col("lang_pred"), lit("und")).as("lang_pred"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Corpus token statistics per group column. */
  def tokenStats(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("docs"),
        sum(size(toks(col(textCol)))).as("tokens"),
        sum(bpeishTokenCount(col(textCol))).as("bpeish_tokens"),
        sum(length(col(textCol))).as("chars"))

  /** Content fingerprint: md5 over the normalised token stream (whitespace/
    * case-insensitive duplicate detection). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(concat_ws(" ", toks(lower(col(textCol))))).as("fp"))

  /**
   * Winnowing-style rolling-hash fingerprints: hash every k-gram window of
   * the token stream, keep each document's minimum w per window position
   * band — robust to local edits. Returns (id, band, fp_hash).
   */
  def rollingFingerprints(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 5, bandSize: Int = 8): DataFrame = {
    // md5 as the window hash: bit-identical across engines (oracle-checkable),
    // and min-per-band over the hex string is plain ASCII ordering everywhere.
    // band = hash-space partition (leading byte, 0-255 — supports up to 256
    // bands with near-uniform spread); min per band = winnowing selection.
    // Within-doc dedup is per-row (array_distinct — no global distinct
    // shuffle); the min itself is a codegen'd grouped aggregation with
    // map-side combine (a per-row lambda fold would run interpreted — see
    // Dedup.minhashSignatures).
    require(bandSize <= 256, "bandSize must be <= 256 (one leading hash byte)")
    val grams = Dedup.shingles(df, idCol, textCol, k)
      .withColumn("h", md5(col("shingle")))
    grams.withColumn("band",
        (conv(substring(col("h"), 1, 2), 16, 10).cast(IntegerType) % bandSize))
      .groupBy("id", "band").agg(min(col("h")).as("fp_hash"))
  }

  /**
   * Fixed-size token chunking with overlap — the standard training-data
   * prep step (context-window packing / RAG chunking): each document's
   * token array becomes ⌈(n−overlap)/(size−overlap)⌉ chunks of `size`
   * tokens, consecutive chunks sharing `overlap` tokens; the final chunk
   * may be short, empty docs yield none. Chunk derivation is a per-row
   * array transform (no shuffle); the explode only pays for rows that
   * downstream stages actually consume.
   */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int = 64, overlap: Int = 8): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val step = size - overlap
    // canonical normalised tokens — same stream as the dedup/shingle family,
    // NOT the raw whitespace split. Materialized in its own projection:
    // no CSE inside lambdas, so slice(normTokens(text), …) would re-run
    // the regex split once per chunk INDEX (same O(words·chunks) trap as
    // ngramStats, measured 9× there)
    val ts = col("__ts")
    val nChunks = when(size_(ts) === 0, 0)
      .otherwise(ceil((size_(ts) - lit(overlap)).cast("double") / step).cast("int"))
    df.select(col(idCol).as("id"), normTokens(col(textCol)).as("__ts"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
          i => array_join(slice(ts, i * step + 1, lit(size)), " "))))
      .where(size_(filter(split(col("col"), " "), t => length(t) > 0)) > 0)
      .select(col("id"), col("pos").as("chunk_index"), col("col").as("chunk_text"),
        size_(filter(split(col("col"), " "), t => length(t) > 0)).as("n_tokens"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /**
   * Deterministic stratified sampling — the data-mixing step of a training
   * pipeline: keep each row iff hash(salt|id) < rate(stratum), with a
   * portable md5-derived 40-bit uniform (the engine's standard portable
   * RNG), so the SAME sample falls out on any engine/run — reproducible
   * data recipes, no RNG state, no shuffle (a pure per-row filter with
   * full pushdown of the stratum column).
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], salt: String,
                       defaultRate: Double = 0.0): DataFrame = {
    val u = (conv(substring(md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 10), 16, 10)
      .cast("double") + 0.5) / 1099511627776.0d
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(u < rate)
  }

  /**
   * Temperature-weighted mixture sampling — the multilingual/multi-domain
   * rebalancing step (the α-sampling of the XLM-R / mT5 recipes): stratum
   * weights are `w_s ∝ n_s^temperature` (τ < 1 upsamples small strata
   * relative to their share, τ = 1 is proportional), each stratum's keep
   * rate is `min(1, targetRows·w_s/Σw / n_s)`, and the keep decision reuses
   * the portable md5-derived per-row uniform of [[stratifiedSample]] — the
   * SAME sample falls out on any engine/run.
   *
   * Distribution: the stratum histogram is a map-side-combined aggregate of
   * |strata| rows, broadcast back as the rate lookup; the filter itself is a
   * narrow per-row decision. Returns the kept rows as (id, stratum, rate
   * rounded to 9 decimals for cross-engine boundary stability).
   */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
                    targetRows: Long, temperature: Double, salt: String): DataFrame = {
    require(targetRows > 0 && temperature > 0, "need targetRows > 0 and temperature > 0")
    val hist = df.groupBy(col(strataCol).as("__s")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast(DoubleType), lit(temperature)))
    val rates = broadcast(hist.crossJoin(broadcast(hist.agg(sum(col("__w")).as("__tw"))))
      .select(col("__s"),
        round(least(lit(1.0d), lit(targetRows.toDouble) * col("__w") / col("__tw") / col("__n")), 9)
          .as("rate")))
    val u = (conv(substring(md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 10), 16, 10)
      .cast("double") + 0.5) / 1099511627776.0d
    // null-SAFE stratum match: groupBy keeps a null stratum in the
    // histogram (its weight counts toward the total), so a plain === join
    // would silently drop every null-stratum row while still deflating all
    // real strata's keep rates — null is a stratum like any other here
    df.join(rates, df(strataCol) <=> rates("__s"))
      .where(u < col("rate"))
      .select(col(idCol), col(strataCol), col("rate"))
  }

  /**
   * Deterministic training shuffle — the global example-reordering step
   * before shard writing (data-loading order must look random but be
   * reproducible across runs/engines): each row gets the portable
   * md5-derived key `md5(salt|id)`, its shard is a hash-balanced function
   * of the key's leading 16 bits (4 hex chars, 65536 slots — see the
   * require below), and its position within the shard is the key's rank
   * there. Reading shards round-robin by position replays one
   * fixed global pseudo-random permutation.
   *
   * Distribution: ONE shuffle keyed by shard (the window partition);
   * per-task work is a sort of corpus/nShards rows — pick nShards so a
   * shard fits a task (the same knob every shard-writer exposes). No
   * global total-order pass: the permutation is defined per shard, which
   * is what training data loaders consume anyway.
   *
   * Returns (id, shard, pos).
   */
  def shuffleShards(df: DataFrame, idCol: String,
                    nShards: Int = 64, salt: String = "shuffle"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 4 leading hex chars = 65536 shard slots: one byte would leave shards
    // beyond 256 permanently empty, and 100 TB corpora want thousands
    require(nShards > 0 && nShards <= 65536, "need 0 < nShards <= 65536")
    val key = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val shard = (conv(substring(key, 1, 4), 16, 10).cast(IntegerType) % nShards)
    // id tiebreak: md5 keys never collide in practice, but a deterministic
    // contract must not depend on that
    val w = Window.partitionBy("shard").orderBy(col("__k").asc, col("id").asc)
    df.select(col(idCol).as("id"), key.as("__k"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast(LongType) - 1)
      .select(col("id"), col("shard"), col("pos"))
  }

  /**
   * Gopher/C4-style heuristic quality rules — the cheap rule cascade every
   * curation pipeline runs before any model-based scoring: word-count
   * bounds, mean-word-length band, symbol-to-word ratio (`#`, `...`, `…`),
   * bulleted-line and ellipsis-line ratios, alphabetic-word ratio, and a
   * required minimum of DISTINCT stopwords (the Gopher "stop word" rule).
   * All metrics are reported alongside the conjunction `keep`, so a
   * pipeline can re-weigh rules without recomputing.
   *
   * Pure per-row column expressions (one scan, no shuffle, full codegen);
   * every regex lives in the Java ∩ RE2 intersection so the DuckDB oracle
   * runs the identical patterns.
   */
  def heuristicFilter(df: DataFrame, idCol: String, textCol: String,
                      minWords: Int = 5, maxWords: Int = 100000,
                      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
                      maxSymbolRatio: Double = 0.1,
                      maxBulletRatio: Double = 0.5, maxEllipsisRatio: Double = 0.3,
                      minAlphaRatio: Double = 0.7, minStopwords: Int = 2): DataFrame = {
    val t = col(textCol)
    val w = toks(t)
    val nW = size_(w).cast(LongType)
    val nWd = greatest(nW, lit(1L)).cast(DoubleType)
    val lines = filter(split(t, "\n"), l => length(l) > 0)
    val nLd = greatest(size_(lines), lit(1)).cast(DoubleType)
    val stops = array(Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")
      .map(lit): _*)
    val meanLen = round(aggregate(w, lit(0L), (acc, x) => acc + length(x)) / nWd, 6)
    val symbolRatio = round(
      size_(regexp_extract_all(t, lit("#|\\.\\.\\.|…"), lit(0))) / nWd, 6)
    val bulletRatio = round(
      size_(filter(lines, l => l.rlike("^[-*•] "))) / nLd, 6)
    val ellipsisRatio = round(
      size_(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))) / nLd, 6)
    val alphaRatio = round(
      size_(filter(w, x => x.rlike("\\p{L}"))) / nWd, 6)
    val stopHits = size_(array_intersect(transform(w, x => lower(x)), stops))
    df.select(col(idCol), nW.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
        ellipsisRatio.as("ellipsis_ratio"), alphaRatio.as("alpha_ratio"),
        stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_ratio") <= maxBulletRatio &&
          col("ellipsis_ratio") <= maxEllipsisRatio &&
          col("alpha_ratio") >= minAlphaRatio &&
          col("stop_hits") >= minStopwords)
  }

  /**
   * Per-group top-k n-gram statistics — the corpus-drift / contamination
   * dashboard feed (which phrases dominate each source; which benchmark
   * n-grams leak into training data). N-grams are windows over the
   * canonical normalised token stream; counting is one (group, ngram)
   * aggregation with map-side combine, the top-k a LOSSLESS two-phase
   * selection: |groups| is tiny (sources, languages) while the n-gram
   * vocabulary is huge, so a single per-group window would gather a whole
   * source's vocabulary into ONE task for sorting — the small-cardinality-
   * group window anti-pattern. Instead each (group, ngram) count — unique
   * after the aggregation — takes a per-(group, salt-bucket) top-k first
   * (64-way parallel, prunes the vocabulary to 64·k rows per group), and
   * only the survivors meet the per-group window. Any global top-k row
   * wins its bucket too, so the pruning is exact. Ties break by ngram for
   * determinism. Returns (group, ngram, cnt).
   */
  def ngramStats(df: DataFrame, groupCol: String, textCol: String,
                 n: Int = 2, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0 && topK > 0, "need n > 0 and topK > 0")
    // materialize the token array in its own projection BEFORE the
    // per-index lambda: Catalyst does no common-subexpression elimination
    // inside lambda functions, so slice(normTokens(text), i, n) would
    // re-run the regex split once per n-gram INDEX — O(words²) splits per
    // document (measured 9× on the gate corpus: 5.3 s → 0.6 s)
    val toks = df.select(col(groupCol).as("grp"), normTokens(col(textCol)).as("__ws"))
    val ws = col("__ws")
    val grams = when(size_(ws) >= n,
      transform(sequence(lit(1), size_(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val counts = toks.select(col("grp"), explode(grams).as("ngram"))
      .groupBy("grp", "ngram").agg(count(lit(1)).as("cnt"))
    val order = Seq(col("cnt").desc, col("ngram").asc)
    val wPartial = Window.partitionBy(col("grp"), pmod(hash(col("ngram")), lit(64)))
      .orderBy(order: _*)
    val survivors = counts
      .withColumn("__rp", row_number().over(wPartial)).where(col("__rp") <= topK)
    val w = Window.partitionBy("grp").orderBy(order: _*)
    survivors.withColumn("__rn", row_number().over(w)).where(col("__rn") <= topK)
      .select(col("grp").as(groupCol), col("ngram"), col("cnt"))
  }

  /**
   * Dataset report — the per-(source, language) card a curation pipeline
   * publishes with every corpus snapshot: document/token/char volumes and
   * the mean quality score. The metrics are narrow per-row expressions and
   * the whole report is ONE map-side-combined aggregation keyed by the
   * group — no per-doc join, no second pass; at 100 TB a single scan.
   */
  def corpusReport(df: DataFrame, sourceCol: String, langCol: String,
                   textCol: String): DataFrame =
    df.select(col(sourceCol) +: col(langCol) +: qualityCols(col(textCol)): _*)
      .withColumn("score", scoreCol)
      .groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_tokens")).as("tokens"),
        sum(col("n_chars")).as("chars"),
        round(avg(col("score")), 6).as("avg_quality"))

  // --------------------------------------------------------------------- PII

  /** PII patterns, shared VERBATIM with the DuckDB oracle — every construct
    * is in the Java-regex ∩ RE2 intersection (no backrefs, no lookaround).
    * The email pattern requires an alphabetic TLD, so `user@203.0.113.9`
    * is left for the IP pass — replacement order (email → phone → IP) is
    * part of the contract. */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat = "\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3,4}[ -]\\d{4}"
  val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /**
   * PII redaction — the compliance pass every training-data pipeline runs
   * before text leaves the curation tier: emails, international-format
   * phone numbers and bare IPv4 addresses are counted (each on the text as
   * the replacement cascade sees it) and replaced by typed placeholders.
   * Pure per-row column expressions — no shuffle, full scan-pipeline
   * fusion; at 100 TB this is a narrow map stage that rides whatever
   * partitioning the scan has.
   */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // each count runs on the text as the cascade sees it at that stage, so
    // n_* always equals the number of placeholders of that type in
    // clean_text — counting phones/IPs on the original text can disagree
    // when an earlier replacement creates or destroys a match boundary
    val afterEmail = regexp_replace(t, emailPat, "[EMAIL]")
    val afterPhone = regexp_replace(afterEmail, phonePat, "[PHONE]")
    df.select(col(idCol),
      size(regexp_extract_all(t, lit(emailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(phonePat), lit(0))).as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(ipPat), lit(0))).as("n_ips"),
      regexp_replace(afterPhone, ipPat, "[IP]").as("clean_text"))
  }

  // -------------------------------------------------------------- repetition

  /**
   * Repetition metrics — the standard quality signal for generated/spammy
   * text (a high top-word share or duplicated-bigram ratio flags degenerate
   * documents). Per-document ratios are pure array expressions over the
   * normalised token stream; the top-word share distributes as one
   * (id, word) aggregation + per-id max — both map-side-combining shuffles
   * keyed by document, so the plan scales with corpus size, never with
   * vocabulary.
   */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), normTokens(col(textCol)).as("w"))
    val n = size_(col("w"))
    val grams = bigramsWith(col("w"), n, (a, b) => concat(a, lit(" "), b), "array<string>")
    val perDoc = base.select(col("id"), col("w"), grams.as("g"),
      n.as("n_words"),
      when(n > 0, round(size_(array_distinct(col("w"))) / n.cast(DoubleType), 6))
        .otherwise(lit(0.0)).as("uniq_word_ratio"))
      .withColumn("dup_bigram_ratio",
        when(size_(col("g")) > 0,
          round(lit(1.0) - size_(array_distinct(col("g"))) / size_(col("g")).cast(DoubleType), 6))
          .otherwise(lit(0.0)))
    // top-word share: distributed mode-per-document (explode → grouped count
    // → per-id max); ties need no break because only the SHARE is reported
    val counts = base.select(col("id"), explode(col("w")).as("wd"))
      .groupBy("id", "wd").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("topc"))
    perDoc.join(Joins.shuffleHashUnlessSmall(counts), Seq("id"), "left")
      .select(col("id"), col("n_words"), col("uniq_word_ratio"), col("dup_bigram_ratio"),
        when(col("n_words") > 0, round(coalesce(col("topc"), lit(0L)) / col("n_words").cast(DoubleType), 6))
          .otherwise(lit(0.0)).as("top_word_share"))
  }

  // ------------------------------------------------------------ tf-idf / BM25

  /**
   * TF-IDF term weights — the retrieval/relevance layer of a curation
   * pipeline (keyword extraction, near-query mining, corpus drift
   * monitoring). Classic smooth-idf formulation:
   * `tf = count(term in doc)`, `idf = ln((N + 1) / (df + 1)) + 1`.
   *
   * Distribution: one explode + (id, term) count (map-side combined), a
   * (term) aggregation for document frequencies, and a term-keyed join of
   * the two — every shuffle is keyed by term or document, so the plan
   * scales with corpus size and the df relation (≤ vocabulary) stays the
   * small side. N enters as a broadcast one-row cross join — computed once
   * by the caller's action, not eagerly at plan-construction time.
   *
   * Returns (id, term, tf, tfidf), the `topK` highest-weighted terms per
   * document (ties broken by term for determinism).
   */
  def tfIdf(df: DataFrame, idCol: String, textCol: String, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // N enters as a broadcast one-row cross join so the whole operator stays
    // lazy — no Spark job fires at DataFrame-construction time
    val nDocs = broadcast(df.agg(count(lit(1)).cast(DoubleType).as("n_docs")))
    val terms = df.select(col(idCol).as("id"), explode(normTokens(col(textCol))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("term")).crossJoin(nDocs)
      .withColumn("tfidf",
        round(col("tf") * (log((col("n_docs") + 1.0d) / (col("df") + 1.0d)) + 1.0d), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .select(col("id"), col("term"), col("tf"), col("tfidf"))
  }

  /**
   * Sequence packing — the GPT-style pretraining prep step: documents are
   * concatenated in a deterministic order and cut into fixed-capacity
   * context windows, so each document lands in bin `floor(start/capacity)`
   * at offset `start mod capacity` (a document may straddle two bins — the
   * concat-then-cut convention). Packing is inherently sequential, so it
   * distributes per SHARD: a portable hash assigns each document to one of
   * `nShards` shards and the running token offset is a window cumsum within
   * the shard — tasks scale with shards, bins never cross shards (bin ids
   * are globally unique via shard * 2^40 + local bin).
   *
   * Returns (id, shard, bin, bin_offset, n_tokens).
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int = 2048, nShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(capacity > 0 && nShards > 0, "need capacity > 0 and nShards > 0")
    val nTok = size_(normTokens(col(textCol)))
    // portable shard hash: same md5-derived uniform as stratifiedSample
    val shard = (conv(substring(md5(concat(lit("pack|"), col(idCol).cast("string"))), 1, 10), 16, 10)
      .cast(LongType) % nShards).cast(IntegerType)
    val base = df.select(col(idCol).as("id"), nTok.as("n_tokens"), shard.as("shard"))
      .where(col("n_tokens") > 0)
    val w = Window.partitionBy("shard").orderBy("id")
    val start = coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L))
    base.withColumn("__start", start)
      .select(col("id"), col("shard"),
        (col("shard").cast(LongType) * (1L << 40) + floor(col("__start") / capacity))
          .as("bin"),
        (col("__start") % capacity).as("bin_offset"),
        col("n_tokens"))
  }

  /**
   * Duplicate-span removal — the exact-substring dedup of Lee et al.
   * ("Deduplicating Training Data Makes Language Models Better"), in its
   * practical span-hash form: cut every document into non-overlapping
   * `spanTokens`-token spans and keep only the globally FIRST occurrence of
   * each distinct span (ordered by (doc, position)); later copies are cut
   * out and the document reassembled from its surviving spans.
   *
   * Distribution: the only corpus-wide shuffle is keyed by the span content
   * itself (the first-occurrence window), so hot spans are ordinary input
   * skew AQE splits; reassembly groups by document and each group is
   * bounded by one document's own spans.
   *
   * Returns (id, n_spans, n_kept, clean_text) — docs whose every span was
   * removed keep a row with n_kept = 0 and empty clean_text.
   */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
                spanTokens: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(spanTokens > 0, "need spanTokens > 0")
    val base = df.select(col(idCol).as("id"), normTokens(col(textCol)).as("w"))
      .where(size_(col("w")) > 0)
      .withColumn("n_spans", ceil(size_(col("w")) / lit(spanTokens.toDouble)).cast(IntegerType))
    val spans = base.select(col("id"), col("n_spans"),
      posexplode(transform(sequence(lit(0), col("n_spans") - 1),
        i => array_join(slice(col("w"), i * spanTokens + 1, lit(spanTokens)), " "))))
      .toDF("id", "n_spans", "idx", "span")
    val w = Window.partitionBy("span").orderBy(col("id").asc, col("idx").asc)
    val kept = spans.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .groupBy("id").agg(
        count(lit(1)).cast(IntegerType).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("idx"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"))
    base.select(col("id"), col("n_spans")).join(Joins.shuffleHashUnlessSmall(kept), Seq("id"), "left")
      .select(col("id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /**
   * Corpus-trained bigram-LM perplexity — the CCNet-style quality filter:
   * train an add-alpha-smoothed bigram language model on the corpus itself
   * and score every document by `ppl = exp(-(Σ log P) / n)` where the first
   * token scores `P(w1) = (c(w1)+α)/(T+αV)` and each bigram
   * `P(w2|w1) = (c(w1,w2)+α)/(c(w1)+αV)`. Low-perplexity documents look
   * like the corpus; high-perplexity ones are outliers/noise.
   *
   * Distribution: the count relations are vocabulary-bounded (not
   * corpus-bounded), so the scoring joins are equi-joins against small
   * sides; the T/V scalars enter as a one-row cross join. Every shuffle is
   * keyed by token, bigram, or document.
   *
   * Returns (id, n_tokens, ppl).
   */
  def lmPerplexity(df: DataFrame, idCol: String, textCol: String,
                   alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, "need alpha > 0")
    // pinned: FIVE consumers re-derive this relation (unigram counts, bigram
    // counts, first-token scores, bigram scores, the final n_tokens join) —
    // without the checkpoint each one re-runs the regex tokenisation of the
    // whole corpus (guide §1.4/§5: one materialisation of the token arrays
    // replaces four corpus-wide recomputes; the text column is dropped, so
    // the pinned relation is token-array-sized)
    val base = df.select(col(idCol).as("id"), normTokens(col(textCol)).as("w"))
      .where(size_(col("w")) > 0)
      .withColumn("n", size_(col("w")))
      .localCheckpoint()
    val grams = bigramsWith(col("w"), col("n"),
      (a, b) => struct(a.as("w1"), b.as("w2")), "array<struct<w1:string,w2:string>>")
    val uni = base.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).cast(DoubleType).as("t"),
      count(lit(1)).cast(DoubleType).as("v"))
    val bi = base.select(explode(grams).as("g"))
      .groupBy(col("g.w1").as("w1"), col("g.w2").as("w2")).agg(count(lit(1)).as("c2"))
    val a = lit(alpha)
    val first = base.select(col("id"), col("w").getItem(0).as("tok"))
      .join(uni, Seq("tok")).crossJoin(broadcast(tot))
      .select(col("id"), log((col("c1") + a) / (col("t") + a * col("v"))).as("lp"))
    val rest = base.select(col("id"), explode(grams).as("g"))
      .select(col("id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
      .join(bi, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("tok", "w1"), Seq("w1")).crossJoin(broadcast(tot))
      .select(col("id"), log((col("c2") + a) / (col("c1") + a * col("v"))).as("lp"))
    base.select(col("id"), col("n"))
      .join(first.unionAll(rest).groupBy("id").agg(sum(col("lp")).as("slp")), Seq("id"))
      .select(col("id"), col("n").as("n_tokens"),
        round(exp(-col("slp") / col("n")), 6).as("ppl"))
  }

  /**
   * BM25 relevance of every document against a keyword query — the standard
   * lexical ranking function (k1/b defaults from the literature). The query
   * is a handful of terms: its term set broadcasts, the corpus streams.
   * `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avgLen))` with
   * the Robertson idf `ln(1 + (N−df+0.5)/(df+0.5))`.
   */
  def bm25(df: DataFrame, idCol: String, textCol: String, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("id"), normTokens(col(textCol)).as("w"))
      .withColumn("len", size(col("w")))
    // N and avgLen enter as a broadcast one-row cross join — the operator
    // stays lazy (no job at construction time) and an empty corpus yields an
    // empty result instead of an NPE on the null avg aggregate
    val stats = broadcast(base.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      avg(col("len")).as("avg_len")))
    val q = broadcast(queryTerms.distinct.toDF("term"))
    val tf = base.select(col("id"), col("len"), explode(col("w")).as("term"))
      .join(q, Seq("term"))
      .groupBy("id", "term", "len").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("term")).crossJoin(stats)
      .withColumn("contrib",
        log(lit(1.0d) + (col("n_docs") - col("df") + 0.5d) / (col("df") + 0.5d)) *
          (col("tf") * (lit(k1) + 1.0d)) /
          (col("tf") + lit(k1) * (lit(1.0d - b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy("id").agg(round(sum(col("contrib")), 6).as("score"))
    scored.orderBy(col("score").desc, col("id").asc).limit(topK)
  }

  /**
   * C4-style line-level corpus dedup — the boilerplate killer: split each
   * document on newlines, trim, drop empty lines, and keep only the
   * globally-FIRST occurrence (by (doc id, line index)) of every exact
   * line; nav bars, cookie banners and footers repeated across a crawl
   * survive exactly once. Documents are reassembled from their surviving
   * lines in order.
   *
   * Distribution: first-occurrence-wins is `min(struct(id, idx))` grouped
   * by line content, NOT a row_number window — a hot boilerplate line
   * ("click here to subscribe" × 10M) is plain input skew under the
   * aggregate (map-side partial min per task, AQE-splittable), whereas a
   * window sort funnels every instance of the hot line through one task.
   *
   * Returns (id, n_lines, n_kept, clean_text).
   */
  def lineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("id"), posexplode(split(col(textCol), "\n")))
      .select(col("id"), col("pos").as("idx"), trim(col("col")).as("line"))
      .where(length(col("line")) > 0)
    val winners = lines.groupBy("line")
      .agg(min(struct(col("id"), col("idx"))).as("w"))
    val kept = lines.join(winners, Seq("line"))
      .where(col("id") === col("w.id") && col("idx") === col("w.idx"))
      .groupBy("id").agg(
        count(lit(1)).cast(IntegerType).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          s => s.getField("line")), "\n").as("clean_text"))
    val counts = lines.groupBy("id").agg(count(lit(1)).cast(IntegerType).as("n_lines"))
    df.select(col(idCol).as("id")).join(Joins.shuffleHashUnlessSmall(counts), Seq("id"), "left")
      .join(Joins.shuffleHashUnlessSmall(kept), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_lines"), lit(0)).as("n_lines"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /**
   * Hashed-bag-of-words linear classifier scoring — the distributed shape
   * of a fastText-style quality/domain filter (FineWeb-Edu, DCLM): each
   * token hashes into one of `nBuckets` weight slots, the document score
   * is `sigmoid(bias + mean(weight[bucket(tok)]))`, and documents at or
   * above `threshold` are kept. The weight TABLE is the model input; here
   * it arrives as a (bucket, weight) DataFrame that broadcast-joins
   * against the exploded token stream — swapping in real trained weights
   * is a data change, not a code change. The bucket hash is the portable
   * md5-derived one every cross-engine op here uses, so an oracle (or a
   * Python trainer exporting weights) reproduces the bucketing exactly.
   *
   * Distribution: explode → broadcast join (model is nBuckets rows) →
   * one document-keyed aggregation. The corpus never shuffles except
   * keyed by document id.
   *
   * Returns (id, n_tokens, score, keep).
   */
  def linearScore(df: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, nBuckets: Int,
                  bias: Double = 0.0, threshold: Double = 0.5,
                  salt: String = "lincls"): DataFrame = {
    // 4 leading hex chars = 65536 bucket slots (same envelope as
    // shuffleShards — a fastText-style model rarely wants more than 2M
    // buckets, and a wider slot space is a one-line change here + oracle)
    require(nBuckets > 0 && nBuckets <= 65536, "need 0 < nBuckets <= 65536")
    val toksDf = df.select(col(idCol).as("id"),
      explode(normTokens(col(textCol))).as("tok"))
    val bucket = conv(substring(md5(concat(lit(salt + "|"), col("tok"))), 1, 4), 16, 10)
      .cast(LongType) % nBuckets
    val w = broadcast(weights.select(col(weights.columns.head).cast(LongType).as("__b"),
      col(weights.columns(1)).cast(DoubleType).as("__wt")))
    val scored = toksDf.withColumn("__b", bucket)
      .join(w, Seq("__b"), "left")
      .groupBy("id").agg(count(lit(1)).cast(IntegerType).as("n_tokens"),
        avg(coalesce(col("__wt"), lit(0.0))).as("m"))
      .select(col("id"), col("n_tokens"),
        round(lit(1.0) / (lit(1.0) + exp(-(lit(bias) + col("m")))), 6).as("score"))
    df.select(col(idCol).as("id")).join(Joins.shuffleHashUnlessSmall(scored), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        coalesce(col("score"), round(lit(1.0) / (lit(1.0) + exp(lit(-bias))), 6)).as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** The deterministic pseudo-weight table used by specs/gates when no
    * trained model is at hand: weight(b) = (((b*2654435761) mod 4001) -
    * 2000) / 2000.0 — integer arithmetic, portable to any SQL engine. */
  def pseudoWeights(spark: org.apache.spark.sql.SparkSession, nBuckets: Int): DataFrame =
    spark.range(nBuckets).select(col("id").as("bucket"),
      (((col("id") * 2654435761L) % 4001L) - 2000L).cast(DoubleType)./(2000.0).as("weight"))

  /** Code-point-range classes shared VERBATIM with the DuckDB oracle
    * (RE2 and Java both accept literal chars in classes — script names
    * differ between the engines, \\p{IsLatin} vs \\p{Latin}, so ranges are
    * the portable spelling). */
  private[graft] val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\u00C0-\u024F]",
    "cyrillic" -> "[\u0400-\u04FF]",
    "cjk" -> "[\u4E00-\u9FFF\u3040-\u30FF\uAC00-\uD7AF]",
    "arabic" -> "[\u0600-\u06FF]",
    "digit" -> "[0-9]")

  /**
   * Unicode-script profile — the script/charset filter every multilingual
   * curation pipeline runs before language ID (a "French" doc that is 80%
   * CJK is mislabeled; mixed-script spam is its own failure class):
   * per-document ratios of Latin / Cyrillic / CJK (incl. kana+hangul) /
   * Arabic / digit code points over non-whitespace chars, plus the
   * dominant script by a deterministic ladder (ties resolve in the order
   * above; no hits → 'other'). Pure codegen column expressions, one scan.
   *
   * Returns (id, n_chars, <script>_ratio..., main_script).
   */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nonWs = size(regexp_extract_all(t, lit("\\S"), lit(0)))
    val counts = scriptRanges.map { case (n, cls) =>
      n -> size(regexp_extract_all(t, lit(cls), lit(0))) }
    val denom = greatest(nonWs, lit(1)).cast(DoubleType)
    val ratioCols = counts.map { case (n, c) => round(c / denom, 6).as(s"${n}_ratio") }
    // deterministic argmax ladder: first script with a strictly-positive
    // count that is >= every later script's count
    val main = counts.zipWithIndex.foldRight(lit("other")) { case (((n, c), i), acc) =>
      val beatsRest = counts.drop(i + 1).map(_._2).foldLeft(lit(true))((a, o) => a && c >= o)
      when(c > 0 && beatsRest, lit(n)).otherwise(acc)
    }
    df.select(col(idCol).as("id") +: nonWs.cast(IntegerType).as("n_chars") +:
      ratioCols :+ main.as("main_script"): _*)
  }

  /**
   * Unicode normalization — the tokenizer-prep pass every multilingual
   * pipeline runs (NFC for storage canonicalization, NFKC for tokenizer
   * input, accent stripping for matching): `java.text.Normalizer` applied
   * as a partition-local typed map (no Spark built-in exposes ICU/JDK
   * normalization; same per-row JVM pattern as the media decoders —
   * narrow, no shuffle, full input parallelism).
   *
   * `stripAccents` decomposes (NFD), removes combining marks (Mn), then
   * applies `form` — the portable "remove diacritics" recipe.
   *
   * Returns (id, norm_text, changed).
   */
  def normalizeText(df: DataFrame, idCol: String, textCol: String,
                    form: String = "NFC", stripAccents: Boolean = false): DataFrame = {
    import java.text.Normalizer
    val nf = Normalizer.Form.valueOf(form)
    // tuple encoder: janino cannot codegen the serializer of a nested
    // private case class (interpreted-mode fallback per query)
    val enc = org.apache.spark.sql.Encoders.product[(Long, String, Boolean)]
    df.select(col(idCol).cast(LongType), col(textCol).cast(StringType))
      .map { row =>
        val id = row.getLong(0)
        val t = if (row.isNullAt(1)) "" else row.getString(1)
        val out =
          if (stripAccents)
            Normalizer.normalize(
              Normalizer.normalize(t, Normalizer.Form.NFD).replaceAll("\\p{Mn}+", ""), nf)
          else Normalizer.normalize(t, nf)
        (id, out, out != t)
      }(enc)
      .toDF("id", "norm_text", "changed")
  }
}
