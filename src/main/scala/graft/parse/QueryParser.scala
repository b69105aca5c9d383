package graft.parse

import graft.model.BoolQuery
import graft.model.BoolQuery._

/** Parser for the reference's tiny full-text query language
  * (reference: src/sifts/core.py:27-67 `QueryParser`):
  *
  *   - tokens are whitespace-separated words
  *   - `and` / `or` keywords, case-insensitive (core.py:35-37, 58-59)
  *   - adjacent words = implicit AND (core.py:44-57 injects `&` for Postgres)
  *   - trailing `*` = prefix match (core.py:60; README.md:69)
  *   - no parentheses, no NOT, no phrases; AND binds tighter than OR —
  *     the reference delegates precedence to fts5/tsquery, both of which give
  *     AND higher precedence.
  *
  * Terms are lowercased to match the tokenizer (fts5 `unicode61` / PG `simple`
  * are case-insensitive).
  */
object QueryParser {

  /** Parse into the Bool AST. Returns None for an effectively-empty query
    * (the reference's `get()` path, core.py:370-384). Stray leading/trailing
    * operators are ignored rather than erroring (the reference would emit
    * malformed FTS syntax there; its tests never exercise it).
    */
  def parse(query: String): Option[BoolQuery] = {
    val tokens = query.trim.split("\\s+").toIndexedSeq.filter(_.nonEmpty)
    if (tokens.isEmpty) return None

    // Split the token stream on OR keywords -> groups of AND-ed words.
    val orGroups = collection.mutable.ArrayBuffer[Vector[String]](Vector.empty)
    tokens.foreach { tok =>
      if (tok.equalsIgnoreCase("or")) orGroups += Vector.empty
      else orGroups(orGroups.size - 1) = orGroups.last :+ tok
    }

    def andGroup(words: Vector[String]): Option[BoolQuery] =
      words.flatMap(leaf).reduceOption(And(_, _))

    orGroups.toVector.flatMap(andGroup).reduceOption(Or(_, _))
  }

  /** Placeholder marker for [[parseExtended]]'s extracted sub-queries — NUL
    * cannot appear as a word character, so no user term collides with a
    * marker token (spelled as the escape; the source stays greppable). */
  private val M = '\u0000'

  /** EXTENDED grammar: everything [[parse]] accepts PLUS
    *
    *   - `"quoted phrase"` → [[BoolQuery.Phrase]] (token-adjacency match;
    *     a single-token quote degrades to a plain Term — same as fts5)
    *   - `near(a b …, k)` → [[BoolQuery.Near]] (all terms within a k-token
    *     window; `k` optional, default 10 — the fts5 NEAR default),
    *     case-insensitive
    *   - `not` → [[BoolQuery.Diff]] (the fts5 binary NOT: `a not b` keeps
    *     a's matches minus b's; `a and not b` spells the same thing).
    *     NOT and AND share a precedence level, left-associative, above OR
    *     — fts5's rule — so `a not b c` = `(a NOT b) AND c`. A literal
    *     word "not" is spelled quoted (`"not"`), like any fts5 keyword.
    *   - `( … )` grouping, overriding precedence: `(a or b) and c`
    *
    * all composable with and/or/implicit-AND like any word. Stray
    * operators degrade instead of erroring, matching [[parse]]'s
    * contract: a leading/trailing operator is ignored (`not a` = `a`,
    * `a or not b` = `a or b`), an unmatched `)` is dropped, an unclosed
    * `(` groups to end-of-query. This is graft-only syntax: the REFERENCE
    * grammar strips quotes to plain terms and has neither NOT nor parens
    * (core.py:35-39 forwards raw engine syntax; core.py:60 pinned by
    * `q2_parser_golden`), so the extension lives in a separate entry
    * point and the parity parser stays byte-exact.
    */
  def parseExtended(query: String): Option[BoolQuery] = {
    val specials = collection.mutable.ArrayBuffer[BoolQuery]()
    def toks(s: String): Seq[String] =
      s.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)
    // placeholders survive the word split: NUL never appears in user text
    // and is not a token separator match target after extraction
    def placeholder(): String = s" $M${specials.size - 1}$M "
    val rxQuote = "\"([^\"]*)\"".r
    // lookbehind: `near(` must start a word — `linear(x)` is a term, not
    // the operator. NEAR extracts BEFORE quotes so quotes inside its args
    // strip as punctuation (`near("a b", 2)` = near(a b, 2)); the converse
    // — a quoted PHRASE whose literal text contains `near(` — is therefore
    // not representable, the cheaper of the two ambiguities.
    val rxNear = "(?i)(?<![\\p{L}\\p{N}])near\\(([^)]*)\\)".r
    // user-supplied NULs are replaced up front: M is OUR marker, so a raw
    // `\u0000<digits>\u0000` in the input must not alias a placeholder (it
    // would index out of bounds into `specials`)
    var txt = rxNear.replaceAllIn(query.replace(M.toString, " "), m => {
      val body = m.group(1)
      val (termsPart, k) = body.lastIndexOf(',') match {
        case i if i >= 0 && body.drop(i + 1).trim.matches("\\d+") =>
          (body.take(i), body.drop(i + 1).trim.toInt)
        case _ => (body, 10)
      }
      val ts = toks(termsPart).distinct
      if (ts.isEmpty) " "
      else {
        specials += (if (ts.size == 1) Term(ts.head) else Near(ts, k))
        placeholder()
      }
    })
    txt = rxQuote.replaceAllIn(txt, m => {
      val ts = toks(m.group(1))
      if (ts.isEmpty) " "
      else {
        specials += (if (ts.size == 1) Term(ts.head) else Phrase(ts))
        placeholder()
      }
    })
    val phRx = ("^" + M + "(\\d+)" + M + "$").r
    // pad grouping parens into their own tokens. Every near(...) was
    // extracted above, so a surviving paren is grouping syntax (a paren
    // glued to a word — `f(x)` — yields the same AND the old punctuation
    // split produced). NO .trim anywhere: String.trim strips every char
    // <= 0x20 — including a leading/trailing placeholder's NUL markers.
    val raw = txt.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").toIndexedSeq.filter(_.nonEmpty)
    // drop unmatched `)` up front (stray-operator contract) so the descent
    // below needs no error states; an unclosed `(` groups to end-of-query
    val tokens = {
      var depth = 0
      raw.filter {
        case "(" => depth += 1; true
        case ")" => if (depth > 0) { depth -= 1; true } else false
        case _ => true
      }
    }
    if (tokens.isEmpty) return None

    // Recursive descent. orExpr := andExpr (OR andExpr)*
    //                   andExpr := factor ((AND? NOT | AND | ε) factor)*
    //                   factor := '(' orExpr ')' | word
    // AND and NOT share one precedence level, left-associative (fts5);
    // missing operands (stray operators, empty groups) fold away.
    var pos = 0
    def peek: String = if (pos < tokens.length) tokens(pos) else ""
    def isKw(t: String, kw: String) = t.equalsIgnoreCase(kw)

    def factor(): Option[BoolQuery] = peek match {
      case "(" =>
        pos += 1
        val inner = orExpr()
        if (peek == ")") pos += 1
        inner
      case w =>
        pos += 1
        w match {
          case phRx(i) => Some(specials(i.toInt))
          case _ => leaf(w)
        }
    }

    def andExpr(): Option[BoolQuery] = {
      var acc: Option[BoolQuery] = None
      while (pos < tokens.length && peek != ")" && !isKw(peek, "or")) {
        // collapse an operator run (`and not`, `and and`) to one op; a NOT
        // anywhere in the run makes it a NOT
        var neg = false
        while (isKw(peek, "and") || isKw(peek, "not")) {
          if (isKw(peek, "not")) neg = true
          pos += 1
        }
        if (pos >= tokens.length || peek == ")" || isKw(peek, "or")) {
          // trailing operator: stray, ignored (the run's tokens were consumed)
        } else factor() match {
          case Some(r) => acc = acc match {
            case Some(l) => Some(if (neg) Diff(l, r) else And(l, r))
            case None => Some(r) // leading operator: stray, ignored
          }
          case None => () // empty group / bare-`*` word: nothing to attach
        }
        // progress: every iteration consumes ≥1 token (the operator run, or
        // factor() — which always advances past its word/group)
      }
      acc
    }

    def orExpr(): Option[BoolQuery] = {
      var acc = andExpr()
      while (isKw(peek, "or")) {
        pos += 1
        andExpr() match {
          case Some(r) => acc = acc.map(Or(_, r)).orElse(Some(r))
          case None => ()
        }
      }
      acc
    }

    // leftover tokens are impossible: andExpr stops only at `)`/OR/end,
    // orExpr consumes every OR, unmatched `)` were filtered above, and a
    // matched `)` is always consumed by its group's factor()
    orExpr()
  }

  /** Word -> leaf AST (None for operator words / bare `*`) — shared by
    * [[parse]] and [[parseExtended]]. */
  private def leaf(word: String): Option[BoolQuery] = {
    // Locale.ROOT: the index side lowercases with Spark's locale-
    // independent lower(); a default-locale toLowerCase on a tr/az JVM
    // maps 'I' -> 'ı' (dotless) and every query containing 'I' would
    // silently match zero postings
    val w = word.toLowerCase(java.util.Locale.ROOT)
    if (w.equalsIgnoreCase("and")) None // handled by implicit-AND folding
    else {
      // Punctuated words are split with the INDEX tokenizer's separator
      // ("don't" -> don AND t) so query terms match their tokenized form —
      // the reference hands the raw word to fts5/to_tsquery, which
      // tokenizes consistently with its index. `*` survives the split: it
      // is wildcard syntax, not punctuation (SQLite accepts it anywhere in
      // a term, reference README.md:69; trailing-only is the PG subset).
      val parts = w.split("[^\\p{L}\\p{N}*]+").toSeq.filter(_.nonEmpty)
      val leaves: Seq[BoolQuery] = parts.flatMap { p =>
        val stars = p.count(_ == '*')
        if (stars == 0) Some(Term(p))
        else if (p.forall(_ == '*')) None // bare `*`: no literal text, drop
        else if (stars == 1 && p.endsWith("*")) Some(Prefix(p.dropRight(1)))
        else Some(Wildcard(p))
      }
      leaves.reduceOption(And(_, _))
    }
  }

  /** Canonical string form, for golden tests / debugging (plays the role of
    * the reference's dialect printers, core.py:35-67). AND prints as `&`,
    * OR as `|`, prefix as `word:*` — the tsquery-ish dialect.
    */
  def print(q: BoolQuery): String = q match {
    case Term(t)      => t
    case Prefix(p)    => s"$p:*"
    case Wildcard(p)  => p // literal `*`s kept — the SQLite-dialect form
    case Phrase(ts)   => "\"" + ts.mkString(" ") + "\""
    case Near(ts, k)  => s"near(${ts.mkString(" ")}, $k)"
    case And(l, r)    => s"${print(l)} & ${print(r)}"
    case Or(l, r)     => s"(${print(l)}) | (${print(r)})"
    case Diff(l, r)   => s"(${print(l)}) &! (${print(r)})"
  }
}
