package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization + URL-keyed deduplication — the provenance-dedup
 * step of a web-scale curation pipeline (CommonCrawl-style corpora carry
 * the same page under scheme/case/tracking-param/fragment variants; URL
 * dedup runs BEFORE content dedup because it needs no text at all).
 *
 * Every canonicalization step is a pure column expression built from
 * constructs in the Java-regex ∩ RE2 intersection, so a DuckDB oracle can
 * run the IDENTICAL patterns (same discipline as [[TextAnalysis.piiScrub]]).
 */
object Urls {

  /** Query params stripped as tracking noise (anchored key= match). */
  val trackingPat = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

  /**
   * Canonical form of a URL string:
   *   - scheme-less input is given `http://`;
   *   - scheme and host lowercase; a leading `www.` and the scheme's
   *     default port (`:80` http, `:443` https) are dropped;
   *   - empty path becomes `/`, trailing slashes are stripped otherwise;
   *   - the fragment is dropped; tracking params ([[trackingPat]]) are
   *     removed and the surviving query params are sorted, so param order
   *     never splits a dedup group.
   *
   * Userinfo (`user@host`) and percent-encoding normalisation are out of
   * scope (kept verbatim). A narrow per-row expression — no shuffle.
   */
  def canonicalize(url: Column): Column = {
    // protocol-relative "//host/path" gets a bare scheme — prepending
    // "http://" would yield "http:////host/path" with an EMPTY authority,
    // so host lowering/www-stripping would never apply and the URL could
    // never dedup with its absolute form
    val u = when(url.startsWith("//"), concat(lit("http:"), url))
      .when(url.contains("://"), url)
      .otherwise(concat(lit("http://"), url))
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostNoWww = regexp_replace(
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val pathStripped = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    val path = when(pathStripped === "", lit("/")).otherwise(pathStripped)
    val qs = array_join(array_sort(filter(
      split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => length(p) > 0 && !p.rlike(trackingPat))), "&")
    // unparseable scheme (e.g. "1http://x"): fall back to the input
    // VERBATIM — otherwise every malformed URL would collapse into one
    // "://" canonical group and wrongly dedup together. Not lowercased:
    // the valid branch keeps path/query case, and case-distinct malformed
    // URLs are distinct documents
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, path,
        when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit(""))))
  }

  /**
   * Deduplicate by canonical URL, keeping the lowest id per group — the
   * standard "first fetch wins" policy. One shuffle, keyed by the canonical
   * URL (the dedup key itself), so at 100 TB this scales exactly like exact
   * content dedup; a hot canonical URL is ordinary input skew AQE splits.
   * Returns (id, canon_url, keep).
   */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("canon_url").orderBy(col("id").asc)
    df.select(col(idCol).cast("long").as("id"), canonicalize(col(urlCol)).as("canon_url"))
      .withColumn("keep", row_number().over(w) === 1)
  }

  /** The canonical host of a URL (lowercased, www/default-port stripped) —
    * the grouping key for domain-level policies. */
  def hostOf(url: Column): Column = {
    val u = when(url.startsWith("//"), concat(lit("http:"), url))
      .when(url.contains("://"), url)
      .otherwise(concat(lit("http://"), url))
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostNoWww = regexp_replace(
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    when(scheme === "", lit("")).otherwise(
      when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
        .otherwise(hostNoWww))
  }

  /**
   * Per-host document cap — the FineWeb/C4-style anti-domination policy:
   * keep at most `maxPerHost` documents per canonical host, lowest id
   * first (deterministic; feed a quality-ranked id if ranking matters).
   *
   * Scale shape: hosts UNDER the cap bypass ranking entirely — one
   * count aggregation splits the corpus, and only over-cap hosts' rows
   * (usually a tiny fraction with a crawl's Zipf host distribution) pay
   * the per-host row_number sort. A mega-host is therefore the only
   * window partition, and its rows are the only ones a straggler task
   * ever holds. Returns (id, host, keep).
   */
  def hostCap(df: DataFrame, idCol: String, urlCol: String,
              maxPerHost: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerHost > 0, "need maxPerHost > 0")
    val base = df.select(col(idCol).cast("long").as("id"),
      hostOf(col(urlCol)).as("host"))
    val counts = base.groupBy("host").agg(count(lit(1)).as("__n"))
    val joined = base.join(counts, Seq("host"))
    val under = joined.where(col("__n") <= maxPerHost)
      .select(col("id"), col("host"), lit(true).as("keep"))
    val w = Window.partitionBy("host").orderBy(col("id").asc)
    val over = joined.where(col("__n") > maxPerHost)
      .select(col("id"), col("host"),
        (row_number().over(w) <= maxPerHost).as("keep"))
    under.unionByName(over)
  }
}
