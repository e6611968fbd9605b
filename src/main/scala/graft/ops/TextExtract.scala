package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the FIRST stage of a web-scale curation
  * pipeline (CommonCrawl HTML in, candidate training text out), before
  * any quality gate ([[TextAnalysis]]) or dedup ([[Dedup]]) sees the
  * document. A jusText-lite re-derivation (Pomikálek 2011's shape:
  * strip markup, segment into blocks at block-level tags, drop
  * boilerplate blocks by per-block heuristics) in pure codegen'd
  * Column expressions — no UDF, no external parser, so the operator
  * runs at parquet-scan speed on a 100 TB crawl and every step has an
  * exact DuckDB spelling for the oracle.
  *
  * Deliberately regex-grade, not an HTML5 tree parser: malformed
  * markup degrades to extra whitespace, never to an error, which is
  * the correct failure mode when the input is the open web. RE2-safe
  * (no backreferences, no lookahead) so the SAME patterns run under
  * DuckDB's regex engine for the oracle compare.
  */
object TextExtract {

  /** Non-content elements whose INNER TEXT must go with the tags. */
  private val ContainerDrops = Seq("script", "style", "noscript",
    "head", "template", "svg", "iframe")

  /** Block-level tags: boundaries between candidate text blocks. */
  private val BlockTags = "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|" +
    "table|section|article|header|footer|blockquote|nav|aside|form|" +
    "figure|figcaption|pre|hr"

  /** Raw markup strip: drop comments and non-content containers, turn
    * block tags into newlines (block boundaries), drop every remaining
    * tag, decode the common entities. Whitespace-noisy by design —
    * [[mainText]] normalizes per block. */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noContainers = ContainerDrops.foldLeft(noComments)((c, t) =>
      regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t\\s*>", " "))
    val blocks = regexp_replace(noContainers,
      s"(?is)</?(?:$BlockTags)(?:\\s[^>]*)?/?>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) =>
        regexp_replace(c, e, java.util.regex.Matcher.quoteReplacement(ch)) }
  }

  /** The DuckDB spelling of [[htmlToText]] over column `col` — same
    * patterns, RE2 dialect ('g' = replace all). */
  def htmlToTextSql(col: String): String = {
    val noComments = s"regexp_replace($col, '(?s)<!--.*?-->', ' ', 'g')"
    val noContainers = ContainerDrops.foldLeft(noComments)((c, t) =>
      s"regexp_replace($c, '(?is)<$t[^>]*>.*?</$t\\s*>', ' ', 'g')")
    val blocks = s"regexp_replace($noContainers, " +
      s"'(?is)</?(?:$BlockTags)(?:\\s[^>]*)?/?>', chr(10), 'g')"
    val noTags = s"regexp_replace($blocks, '(?s)<[^>]*>', ' ', 'g')"
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => s"replace($c, '$e', '$ch')" }
  }

  /** Boilerplate-dropping main-text extraction: markup strip, block
    * segmentation at the newlines [[htmlToText]] planted, per-block
    * whitespace normalization, then the jusText-lite gate — a block
    * survives iff it carries at least `minWords` words (nav bars,
    * copyright lines, button labels, cookie banners are short; body
    * prose is not). Surviving blocks re-join with single newlines.
    * One projection, no shuffle, O(document) per row. */
  def mainText(html: Column, minWords: Int = 5): Column =
    array_join(
      filter(
        transform(split(htmlToText(html), "\n"),
          l => trim(regexp_replace(l, "\\s+", " "))),
        l => l =!= "" && size(split(l, " ")) >= minWords),
      "\n")

  /** The DuckDB spelling of [[mainText]]. */
  def mainTextSql(col: String, minWords: Int = 5): String =
    s"array_to_string(list_filter(list_transform(" +
      s"string_split(${htmlToTextSql(col)}, chr(10)), " +
      s"l -> trim(regexp_replace(l, '\\s+', ' ', 'g'))), " +
      s"l -> l <> '' AND len(string_split(l, ' ')) >= $minWords), " +
      "chr(10))"
}
