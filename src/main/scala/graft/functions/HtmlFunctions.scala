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
  * Coverage: the references serializers actually emit — the five XML named
  * entities (`amp lt gt quot apos`) plus `nbsp` (→ U+00A0, which the
  * extraction chain's whitespace collapse then folds), and numeric
  * references `&#NNNN;` / `&#xHHHH;` for any valid scalar codepoint
  * (0 < cp ≤ U+10FFFF, surrogates excluded). Anything else — unknown names,
  * out-of-range or malformed numerics, a bare `&` — is left VERBATIM: for a
  * curation pipeline, preserving bytes beats guessing at the long tail of
  * 2,000+ HTML5 names.
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

  private def named(body: String): String = body match {
    case "amp"  => "&"
    case "lt"   => "<"
    case "gt"   => ">"
    case "quot" => "\""
    case "apos" => "'"
    case "nbsp" => "\u00A0" // non-breaking space
    case _      => null
  }

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
