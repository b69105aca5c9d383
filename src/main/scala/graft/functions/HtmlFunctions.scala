package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding — the entity step of X128 HTML→text
  * extraction ([[graft.ext.Html]]). One SINGLE left-to-right pass, the
  * WHATWG-parser property a `regexp_replace` chain cannot give: decoded
  * output is never re-scanned, so `&amp;lt;` decodes to the four characters
  * `&lt;` (text), never to `<` (double-decode — the classic sanitizer bug).
  *
  * Coverage: the high-frequency names real crawls carry — the five XML
  * names, `nbsp` (→ U+00A0, which the extraction chain's whitespace
  * collapse then folds), the full Latin-1 block (accented letters, signs,
  * fractions), the General-Punctuation set (`mdash hellip rsquo …`), the
  * common symbols (`euro trade copy reg`) — see [[NamedTable]] — and
  * numeric references `&#NNNN;` / `&#xHHHH;` for any valid scalar
  * codepoint (0 < cp ≤ U+10FFFF, surrogates excluded). Anything else —
  * unknown names, out-of-range or malformed numerics, a bare `&` — is left
  * VERBATIM: for a curation pipeline, preserving bytes beats guessing at
  * the long tail of 2,000+ HTML5 names.
  *
  * Same shape as [[StringFold]]: a plain static method invoked via
  * `StaticInvoke`, so the column form is codegen'd and whole-stage spans
  * stay intact; null in → null out. The ASCII fast path (no '&' at all)
  * returns the input buffer unchanged — on a typical tag-stripped web page
  * the scan is the only cost.
  */
object HtmlEntities {

  /** Longest reference body we accept: `#x10FFFF` (8 chars). Bounds the
    * lookahead so a pathological "&" + megabytes-to-next-";" row stays O(1)
    * at each '&'.
    */
  private val MaxBody = 8

  /** The named references real crawls actually carry: the five XML names,
    * the Latin-1 block (accented letters, signs, fractions), and the
    * General-Punctuation/common-symbol names (dashes, curly quotes,
    * ellipsis, euro, trade). Pure data \u2014 the WHATWG long tail beyond this
    * is left verbatim by design (preserving bytes beats guessing). All
    * names fit [[MaxBody]]; case-SENSITIVE like the HTML5 table
    * (`&Auml;` \u2260 `&auml;`).
    */
  private val NamedTable: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](256)
    val entries = Seq(
      // XML five + nbsp
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
      "nbsp" -> "\u00A0",
      // Latin-1 signs and symbols
      "iexcl" -> "\u00A1", "cent" -> "\u00A2", "pound" -> "\u00A3", "curren" -> "\u00A4",
      "yen" -> "\u00A5", "brvbar" -> "\u00A6", "sect" -> "\u00A7", "uml" -> "\u00A8",
      "copy" -> "\u00A9", "ordf" -> "\u00AA", "laquo" -> "\u00AB", "not" -> "\u00AC",
      "shy" -> "\u00AD", "reg" -> "\u00AE", "macr" -> "\u00AF", "deg" -> "\u00B0",
      "plusmn" -> "\u00B1", "sup2" -> "\u00B2", "sup3" -> "\u00B3", "acute" -> "\u00B4",
      "micro" -> "\u00B5", "para" -> "\u00B6", "middot" -> "\u00B7", "cedil" -> "\u00B8",
      "sup1" -> "\u00B9", "ordm" -> "\u00BA", "raquo" -> "\u00BB", "frac14" -> "\u00BC",
      "frac12" -> "\u00BD", "frac34" -> "\u00BE", "iquest" -> "\u00BF",
      "times" -> "\u00D7", "divide" -> "\u00F7",
      // Latin-1 accented letters (both cases)
      "Agrave" -> "\u00C0", "Aacute" -> "\u00C1", "Acirc" -> "\u00C2", "Atilde" -> "\u00C3",
      "Auml" -> "\u00C4", "Aring" -> "\u00C5", "AElig" -> "\u00C6", "Ccedil" -> "\u00C7",
      "Egrave" -> "\u00C8", "Eacute" -> "\u00C9", "Ecirc" -> "\u00CA", "Euml" -> "\u00CB",
      "Igrave" -> "\u00CC", "Iacute" -> "\u00CD", "Icirc" -> "\u00CE", "Iuml" -> "\u00CF",
      "ETH" -> "\u00D0", "Ntilde" -> "\u00D1", "Ograve" -> "\u00D2", "Oacute" -> "\u00D3",
      "Ocirc" -> "\u00D4", "Otilde" -> "\u00D5", "Ouml" -> "\u00D6", "Oslash" -> "\u00D8",
      "Ugrave" -> "\u00D9", "Uacute" -> "\u00DA", "Ucirc" -> "\u00DB", "Uuml" -> "\u00DC",
      "Yacute" -> "\u00DD", "THORN" -> "\u00DE", "szlig" -> "\u00DF",
      "agrave" -> "\u00E0", "aacute" -> "\u00E1", "acirc" -> "\u00E2", "atilde" -> "\u00E3",
      "auml" -> "\u00E4", "aring" -> "\u00E5", "aelig" -> "\u00E6", "ccedil" -> "\u00E7",
      "egrave" -> "\u00E8", "eacute" -> "\u00E9", "ecirc" -> "\u00EA", "euml" -> "\u00EB",
      "igrave" -> "\u00EC", "iacute" -> "\u00ED", "icirc" -> "\u00EE", "iuml" -> "\u00EF",
      "eth" -> "\u00F0", "ntilde" -> "\u00F1", "ograve" -> "\u00F2", "oacute" -> "\u00F3",
      "ocirc" -> "\u00F4", "otilde" -> "\u00F5", "ouml" -> "\u00F6", "oslash" -> "\u00F8",
      "ugrave" -> "\u00F9", "uacute" -> "\u00FA", "ucirc" -> "\u00FB", "uuml" -> "\u00FC",
      "yacute" -> "\u00FD", "thorn" -> "\u00FE", "yuml" -> "\u00FF",
      // Latin Extended / ligatures
      "OElig" -> "\u0152", "oelig" -> "\u0153", "Scaron" -> "\u0160", "scaron" -> "\u0161",
      "Yuml" -> "\u0178", "fnof" -> "\u0192",
      // spaces and format controls
      "ensp" -> "\u2002", "emsp" -> "\u2003", "thinsp" -> "\u2009",
      "zwnj" -> "\u200C", "zwj" -> "\u200D", "lrm" -> "\u200E",
      "rlm" -> "\u200F",
      // general punctuation
      "ndash" -> "\u2013", "mdash" -> "\u2014", "lsquo" -> "\u2018",
      "rsquo" -> "\u2019", "sbquo" -> "\u201A", "ldquo" -> "\u201C",
      "rdquo" -> "\u201D", "bdquo" -> "\u201E", "dagger" -> "\u2020",
      "Dagger" -> "\u2021", "bull" -> "\u2022", "hellip" -> "\u2026", "permil" -> "\u2030",
      "prime" -> "\u2032", "Prime" -> "\u2033", "lsaquo" -> "\u2039", "rsaquo" -> "\u203A",
      "oline" -> "\u203E", "frasl" -> "\u2044",
      // currency / symbols / arrows / math
      "euro" -> "\u20AC", "trade" -> "\u2122", "larr" -> "\u2190", "uarr" -> "\u2191",
      "rarr" -> "\u2192", "darr" -> "\u2193", "harr" -> "\u2194", "minus" -> "\u2212",
      "infin" -> "\u221E", "ne" -> "\u2260", "le" -> "\u2264", "ge" -> "\u2265")
    entries.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private def named(body: String): String = NamedTable.get(body)

  def decode(s: String): String = {
    if (s == null) return null
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var anyConsumed = false
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      i = amp
      // try to consume one reference at i; on failure emit '&' and move on
      var consumed = false
      val limit = math.min(n, amp + 2 + MaxBody) // '&' + body + ';'
      var semi = amp + 1
      while (semi < limit && s.charAt(semi) != ';') semi += 1
      if (semi < limit && semi > amp + 1 && s.charAt(semi) == ';') {
        val body = s.substring(amp + 1, semi)
        if (body.charAt(0) == '#') {
          val hex = body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
          val digits = body.substring(if (hex) 2 else 1)
          val radix = if (hex) 16 else 10
          var ok = digits.nonEmpty
          var cp = 0
          var j = 0
          while (ok && j < digits.length) {
            val d = Character.digit(digits.charAt(j), radix)
            if (d < 0) ok = false else cp = cp * radix + d
            j += 1
          }
          // valid Unicode scalar values only (NUL and surrogates excluded)
          if (ok && cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
            sb.appendCodePoint(cp)
            i = semi + 1
            consumed = true
            anyConsumed = true
          }
        } else {
          val rep = named(body)
          if (rep != null) {
            sb.append(rep)
            i = semi + 1
            consumed = true
            anyConsumed = true
          }
        }
      }
      if (!consumed) {
        sb.append('&')
        i = amp + 1
      }
      amp = s.indexOf('&', i)
    }
    // nothing actually decoded (bare/invalid '&'s only): hand back the
    // INPUT object so the UTF8String overload's fast path holds and a
    // 100 TB pass over '&'-bearing but entity-free text never re-encodes
    if (!anyConsumed) return s
    sb.append(s, i, n)
    sb.toString
  }

  /** UTF8String overload — the StaticInvoke target. Returns the INPUT
    * object when nothing decodes (no re-encode on the fast path).
    */
  def decode(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val t = s.toString
      val d = decode(t)
      if (d eq t) s else UTF8String.fromString(d)
    }

  /** Expression form — the codegen'd static call; shared by the Column
    * wrapper and the `graft_html_entity_decode` SQL builder (a SQL
    * function builder must return a REAL catalyst tree: a Column-node
    * wrapper stays Unevaluable there).
    */
  def decodeExpr(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(HtmlEntities.getClass, StringType, "decode",
      Seq(e), Seq(StringType), returnNullable = true)

  /** Column form — codegen'd static call, null in → null out. */
  def decodeHtmlEntities(content: Column): Column =
    Bridge.column(decodeExpr(Bridge.expression(content)))
}
