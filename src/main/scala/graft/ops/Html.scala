package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * HTML → text extraction: the boilerplate-stripping step between crawl
 * ingestion ([[graft.sources.Warc]]) and the text-quality operators
 * ([[TextAnalysis]]). C4/CCNet-style pipelines run exactly this shape over
 * every crawled page before any quality or dedup pass.
 *
 * Pure column expressions (whole-stage codegen, narrow transform — no
 * shuffle, no UDF). Every regex sits in the Java ∩ RE2 intersection
 * (inline `(?is)` flags, non-greedy quantifiers, plain character classes;
 * no lookaround, no backreferences) so the DuckDB gate oracle runs the
 * IDENTICAL patterns — the extraction is differentially pinned against a
 * second regex engine, not just spec-read.
 *
 * Deliberately NOT a full HTML5 tree parser: tag-aware text extraction
 * (drop script/style/comments, strip tags, decode the common entities,
 * collapse whitespace) is what C4 used and is robust to the malformed tag
 * soup real crawls contain, where a strict parser rejects half the corpus.
 */
object Html {

  // Cascade order matters and is part of the contract:
  // comments first (may contain '<tags>'), then script/style BLOCKS (their
  // bodies may contain '<' that isn't a tag), then remaining tags, then
  // entities (must run after tag-stripping so '&lt;p&gt;' in TEXT does not
  // become a strippable tag), '&amp;' LAST so '&amp;lt;' decodes to '&lt;'
  // not '<'.
  private[graft] val commentPat = "(?s)<!--.*?-->"
  private[graft] val scriptPat  = "(?is)<script[^>]*>.*?</script>"
  private[graft] val stylePat   = "(?is)<style[^>]*>.*?</style>"
  private[graft] val tagPat     = "(?s)<[^>]*>"
  private[graft] val wsPat      = "[ \\t\\r\\n]+"
  private[graft] val titlePat   = "(?is)<title[^>]*>(.*?)</title>"
  private[graft] val linkPat    = "(?i)<a[ \\t\\r\\n>]"

  /** The text column an HTML column extracts to. */
  def textOf(html: Column): Column = {
    val noComments = regexp_replace(html, commentPat, " ")
    val noScript = regexp_replace(noComments, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noTags = regexp_replace(noStyle, tagPat, " ")
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, wsPat, " "))
  }

  /** Per-page extraction: title, visible text, link count, and the
    * text-to-markup ratio (the classic boilerplate signal — chrome-heavy
    * pages score low). */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    df.select(col(idCol),
      regexp_extract(h, titlePat, 1).as("title"),
      textOf(h).as("text"),
      size(regexp_extract_all(h, lit(linkPat), lit(0))).as("n_links"),
      when(length(h) > 0,
        round(length(textOf(h)).cast(DoubleType) / length(h).cast(DoubleType), 6))
        .otherwise(lit(0.0)).as("text_ratio"))
  }

  /** Deterministic HTML page synthesized around a document's text: head
    * with title + a script whose body contains hostile '<p>' markup, nav
    * boilerplate, the text inside content markup with entities, a comment,
    * and a footer — every cascade stage has something to remove. Mirrored
    * verbatim by the gate oracle's SQL string construction. */
  def syntheticPage(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      concat(
        lit("<!DOCTYPE html>\n<html>\n<head>\n<title>Doc "), col(idCol),
        lit(" &amp; friends</title>\n<style>body { color: #333; }</style>\n"),
        lit("<script type=\"text/javascript\">var x = \"<p>not text</p>\"; if (1 < 2) { x = x + \"&amp;\"; }</script>\n"),
        lit("</head>\n<body>\n<nav><a href=\"/home\">Home</a> <a href=\"/about\">About</a></nav>\n"),
        lit("<!-- rendered by crawler "), col(idCol) % 7, lit(" -->\n"),
        lit("<h1>Document "), col(idCol), lit("</h1>\n<p>"), col(textCol),
        lit("</p>\n<p>Tags: &lt;b&gt;bold&lt;/b&gt; &quot;quoted&quot; &#39;s &nbsp;end</p>\n"),
        lit("<footer><a href=\"/tos\">Terms</a></footer>\n</body>\n</html>")
      ).as("html"))
}
