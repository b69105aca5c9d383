package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HtmlEntities

/** X128: HTML → text extraction — the first transform of every web-corpus
  * pipeline (raw crawl HTML → the text all downstream curation operates
  * on). A deterministic, regex-extractor design (the jusText/WET-file
  * family, not a DOM parser): no parser library, no per-row tree
  * allocation, and every step is a codegen'd builtin, so a 100 TB
  * extraction pass is one zero-shuffle projection over the crawl scan.
  *
  * The chain (order is load-bearing and mirrored by the x128 oracle):
  *   1. comments `<!-- … -->` → space (first: a comment may contain tags);
  *   2. container elements whose BODY is not text — `<script> <style>
  *      <noscript> <template>` — dropped whole (per-tag patterns, not a
  *      backreference: RE2-class engines can replay the oracle);
  *   3. block-structure boundaries (`<br>` and closing `</p> </div> </li>
  *      </tr> </h1-6> …`) → newline, so paragraph structure survives for
  *      the line-level operators (X24 boilerplate, X25 line dedup);
  *   4. every remaining tag → SPACE (never "": gluing `</td><td>` cells
  *      into one token corrupts more than splitting a mid-word `<b>`
  *      does; the collapse below cleans the spaces up);
  *   5. entity decode — AFTER tag strip, the HTML semantics (`&lt;script&gt;`
  *      is text, not a tag) — via [[graft.functions.HtmlEntities]], a
  *      single-pass decoder (never re-decodes its own output);
  *   6. whitespace discipline: horizontal runs (incl. the decoded U+00A0)
  *      → one space, spaces trimmed around newlines, newline runs → one
  *      newline, result trimmed.
  *
  * Known regex-extractor limits, accepted and documented: an attribute
  * value containing a literal `>` ends its tag early; an unterminated
  * `<script>` degrades to tag-stripping its body (truncated-crawl rows
  * degrade instead of erroring); CDATA is not special-cased (XHTML-only).
  * A stray `<` that does not open a letter/`/`/`!` run (e.g. "a < b")
  * survives as text.
  */
object Html {

  /** Elements whose content is not text — dropped with their bodies. */
  private val Containers = Seq("script", "style", "noscript", "template")

  /** Tags that end a text block: their boundary becomes a newline. */
  private val BlockBreak =
    "(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/blockquote|/ul|/ol|/table|/pre" +
      "|/dd|/dt|/section|/article|/header|/footer)\\b[^>]*>"

  /** Expression form of the chain — shared by the Column wrapper and the
    * `graft_html_text` SQL builder (a SQL function builder must return a
    * REAL catalyst tree; a functions-API Column wrapped back to an
    * expression stays an Unevaluable column-node there).
    */
  def htmlToTextExpr(html: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
    def rr(e: org.apache.spark.sql.catalyst.expressions.Expression,
           pat: String, rep: String) = RegExpReplace(e, Literal(pat), Literal(rep))
    val noComment = rr(html, "(?s)<!--.*?-->", " ")
    val noContainer = Containers.foldLeft(noComment) { (c, t) =>
      rr(c, s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", " ")
    }
    val withBreaks = rr(noContainer, BlockBreak, "\n")
    val noTags = rr(withBreaks, "</?[a-zA-Z!][^>]*>", " ")
    val decoded = HtmlEntities.decodeExpr(noTags)
    val oneSpace = rr(decoded, "[ \\t\\r\\u000B\\f\\u00A0]+", " ")
    val tightNl = rr(oneSpace, " ?\\n ?", "\n")
    val oneNl = rr(tightNl, "\\n+", "\n")
    // trim of {space, \n} at both ends — spelled as a regex because the
    // two-parameter trim() signature is deprecated in Spark 4
    rr(oneNl, "^[ \\n]+|[ \\n]+$", "")
  }

  /** html → extracted text. Null in → null out (every step is
    * null-propagating). Pure per-row column math — fully codegen'd, zero
    * shuffle, linear in the HTML bytes.
    */
  def htmlToText(html: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(htmlToTextExpr(Bridge.expression(html)))
  }

  /** Frame form: adds `outCol` = extracted text of `htmlCol`. */
  def extractText(docs: DataFrame, htmlCol: String = "html",
                  outCol: String = "content"): DataFrame =
    docs.withColumn(outCol, htmlToText(col(htmlCol)))

  // --- X128b: HTML metadata extraction -----------------------------------
  //
  // The head fields a crawl pipeline carries alongside the text: <title>,
  // rel=canonical (the dedup key crawlers PREFER over the fetch URL — feed
  // it to Web.dedupByUrl), the meta description, and the html lang
  // attribute (the declared language, vs X8's detected one). All
  // regexp_extract projections — zero shuffle; empty match → NULL (a page
  // without the field is a NULL, never ""). Robustness decisions, each one
  // a real-crawl failure mode:
  //   - comments and script/style/noscript/template bodies are stripped
  //     FIRST (a commented-out <title> or a document.write'd <link> must
  //     not win over the live one) — the four extractors share the
  //     identical strip subtree, so one projection evaluates it once
  //     (codegen subexpression elimination);
  //   - the search is bounded to the pre-<body> region when a <body> tag
  //     exists (an inline SVG <title> in the body must not become the page
  //     title); pages without <body> search whole;
  //   - attribute VALUES capture per-quote ([^"]* inside "…", [^']* inside
  //     '…') — a double-quoted value containing an apostrophe ("Jane's
  //     blog") must not truncate at the apostrophe;
  //   - attribute names require a preceding \s, not \b ('-' and ':' are
  //     word boundaries — data-lang/xml:lang must not satisfy `lang`);
  //   - both attribute orders are handled; UNQUOTED attribute values
  //     (<meta name=robots content=noindex> — common in real crawl HTML)
  //     match alongside the quoted forms: an unquoted value runs to the
  //     next whitespace or '>' (the HTML5 unquoted-value rule; a quote
  //     INSIDE an unquoted value stays out of contract).

  private def firstGroupOrNull(c: Column, pattern: String): Column = {
    val m = regexp_extract(c, pattern, 1)
    when(m === "", lit(null).cast("string")).otherwise(m)
  }

  /** Comments and non-content containers removed — what the metadata
    * extractors are allowed to see. */
  private def stripNonContent(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    Containers.foldLeft(noComment) { (c, t) =>
      regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", " ")
    }
  }

  /** The stripped pre-<body> region (whole stripped doc when no <body>).
    * <body> presence is tested SEPARATELY from the capture: a document
    * that starts directly at `<body` has an EMPTY head region, which must
    * stay empty — conflating empty-match with no-match (the old coalesce
    * over firstGroupOrNull) fell back to searching the whole document,
    * letting an in-body `<svg><title>` become the page title, the exact
    * failure the body-bound exists to prevent.
    */
  private def headRegion(html: Column): Column = {
    val stripped = stripNonContent(html)
    when(stripped.rlike("(?is)<body\\b"),
      regexp_extract(stripped, "(?is)^(.*?)<body\\b", 1))
      .otherwise(stripped)
  }

  /** The value of `valAttr` on the FIRST element `<tag … sel="selVal" …>`
    * in document order. Two steps so precedence is by position, not by
    * quote-pattern (a coalesce over per-quote patterns would let a later
    * double-quoted element beat an earlier single-quoted one): first the
    * whole first matching ELEMENT is extracted (selector attribute in any
    * quote style INCLUDING unquoted, either attribute order), then the
    * value attribute is read out of that element with its capture class
    * bound to its own opening quote — or, unquoted, run to the next
    * whitespace/quote/`>`. A selector-matching element that LACKS the
    * value attribute resolves to NULL (it is the first occurrence and it
    * carries no value), not to a later element's value. */
  private def attrValue(region: Column, tag: String, selAttr: String,
                        selVal: String, valAttr: String): Column = {
    val sel =
      s"""\\s$selAttr\\s*=\\s*(?:"$selVal"|'$selVal'|$selVal(?=[\\s/>]))"""
    val elem = firstGroupOrNull(region, s"(?is)(<$tag\\b[^>]*$sel[^>]*>)")
    coalesce(
      firstGroupOrNull(elem, s"""(?is)\\s$valAttr\\s*=\\s*"([^"]*)""""),
      firstGroupOrNull(elem, s"(?is)\\s$valAttr\\s*=\\s*'([^']*)'"),
      firstGroupOrNull(elem, s"""(?is)\\s$valAttr\\s*=\\s*([^\\s"'>]+)"""))
  }

  /** `<title>` text (head region only), entity-decoded, inner whitespace
    * collapsed/trimmed; NULL when absent or empty. */
  def titleOf(html: Column): Column = {
    val raw = firstGroupOrNull(headRegion(html), "(?is)<title[^>]*>(.*?)</title\\s*>")
    val decoded = HtmlEntities.decodeHtmlEntities(raw)
    firstGroupOrNull(
      regexp_replace(decoded, "[\\s\\u00A0]+", " "), "^ ?(.*?) ?$")
  }

  /** `rel=canonical` href, entity-DECODED (a correctly serialized href
    * writes `&` as `&amp;` — left undecoded it would corrupt the
    * canonicalizeUrl dedup key); NULL when the link is absent. */
  def canonicalUrlOf(html: Column): Column =
    HtmlEntities.decodeHtmlEntities(
      attrValue(headRegion(html), "link", "rel", "canonical", "href"))

  /** `<meta name="description" content="…">` — both attribute orders,
    * entity-decoded; NULL when absent. */
  def metaDescriptionOf(html: Column): Column =
    HtmlEntities.decodeHtmlEntities(
      attrValue(headRegion(html), "meta", "name", "description", "content"))

  /** The `<html lang="…">` declared language, lowercased; NULL when
    * undeclared. Quoted or unquoted (`<html lang=en>`). */
  def declaredLangOf(html: Column): Column = {
    val region = headRegion(html)
    lower(coalesce(
      firstGroupOrNull(region, "(?is)<html\\b[^>]*\\slang\\s*=\\s*\"([^\"]*)\"[^>]*>"),
      firstGroupOrNull(region, "(?is)<html\\b[^>]*\\slang\\s*=\\s*'([^']*)'[^>]*>"),
      firstGroupOrNull(region, "(?is)<html\\b[^>]*\\slang\\s*=\\s*([^\\s\"'>]+)[^>]*>")))
  }

  /** `<meta name="robots" content="…">` directives, lowercased (directive
    * tokens are case-insensitive per the robots-meta convention); NULL
    * when the page declares none. Feed to [[graft.ext.Web.dropNoindex]].
    */
  def metaRobotsOf(html: Column): Column =
    lower(attrValue(headRegion(html), "meta", "name", "robots", "content"))

  /** Frame form: (title, canonical_url, meta_description, declared_lang,
    * robots) appended — the head-metadata sidecar of a crawl scan, one
    * zero-shuffle projection. */
  def extractMetadata(docs: DataFrame, htmlCol: String = "html"): DataFrame =
    docs
      .withColumn("title", titleOf(col(htmlCol)))
      .withColumn("canonical_url", canonicalUrlOf(col(htmlCol)))
      .withColumn("meta_description", metaDescriptionOf(col(htmlCol)))
      .withColumn("declared_lang", declaredLangOf(col(htmlCol)))
      .withColumn("robots", metaRobotsOf(col(htmlCol)))
}
