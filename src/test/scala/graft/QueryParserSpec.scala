package graft
// (extended-grammar cases live at the bottom of this spec)

import graft.model.BoolQuery._
import graft.parse.QueryParser
import org.scalatest.funsuite.AnyFunSuite

/** Golden parser tests, mirroring the reference's
  * tests/sifts/test_queryparser.py (10 string goldens) against our AST +
  * canonical printer.
  */
class QueryParserSpec extends AnyFunSuite {

  private def p(s: String) = QueryParser.parse(s)

  test("single word") { assert(p("Lorem").contains(Term("lorem"))) }

  test("trim and whitespace") {
    assert(p("  Lorem   ipsum ").contains(And(Term("lorem"), Term("ipsum"))))
  }

  test("implicit AND between adjacent words") {
    assert(p("Lorem ipsum dolor").contains(
      And(And(Term("lorem"), Term("ipsum")), Term("dolor"))))
  }

  test("explicit and, case-insensitive") {
    assert(p("Lorem AND ipsum") === p("Lorem and ipsum"))
    assert(p("Lorem and ipsum").contains(And(Term("lorem"), Term("ipsum"))))
  }

  test("or, case-insensitive") {
    assert(p("Lorem OR ipsum").contains(Or(Term("lorem"), Term("ipsum"))))
    assert(p("lorem or ipsum") === p("Lorem OR ipsum"))
  }

  test("AND binds tighter than OR (fts5/tsquery precedence)") {
    assert(p("a b or c").contains(Or(And(Term("a"), Term("b")), Term("c"))))
    assert(p("a or b c").contains(Or(Term("a"), And(Term("b"), Term("c")))))
  }

  test("trailing * = prefix") {
    assert(p("Lor*").contains(Prefix("lor")))
    assert(p("Lorem ips*").contains(And(Term("lorem"), Prefix("ips"))))
  }

  test("empty / whitespace-only query -> None (get path)") {
    assert(p("").isEmpty)
    assert(p("   ").isEmpty)
  }

  test("stray operators ignored") {
    assert(p("or").isEmpty)
    assert(p("and lorem").contains(Term("lorem")))
    assert(p("lorem or").contains(Term("lorem")))
  }

  test("punctuation stripped to tokenizer-legal form") {
    assert(p("\"Lorem,\"").contains(Term("lorem")))
  }

  test("intra-word punctuation splits into AND of sub-terms (index-tokenizer parity)") {
    assert(p("don't").contains(And(Term("don"), Term("t"))))
    assert(p("e-mail guide").contains(And(And(Term("e"), Term("mail")), Term("guide"))))
    assert(p("foo-bar*").contains(And(Term("foo"), Prefix("bar"))))
  }

  test("canonical print") {
    assert(QueryParser.print(p("a b or c*").get) === "(a & b) | (c:*)")
  }

  test("mid-token wildcard (SQLite parity: * anywhere in a term)") {
    assert(p("te*m").contains(Wildcard("te*m")))
    assert(p("a*b*c").contains(Wildcard("a*b*c")))
    assert(p("*fix").contains(Wildcard("*fix")))
    assert(p("Lorem te*m").contains(And(Term("lorem"), Wildcard("te*m"))))
    // bare stars carry no literal text -> dropped like stray operators
    assert(p("*").isEmpty)
    assert(p("** lorem").contains(Term("lorem")))
    // trailing-only star stays the range-prunable Prefix form
    assert(p("don't*").contains(And(Term("don"), Prefix("t"))))
  }

  test("wildcard regex anchors and escapes") {
    assert(Wildcard("te*m").regex === "^\\Qte\\E.*\\Qm\\E$")
    assert(Wildcard("*fix").regex === "^.*\\Qfix\\E$")
    assert(Wildcard("a*b*c").regex === "^\\Qa\\E.*\\Qb\\E.*\\Qc\\E$")
  }

  private def px(q: String) = QueryParser.parseExtended(q)

  test("parseExtended: phrases, near, composition, degradations") {
    assert(px("\"table hash\"").contains(Phrase(Seq("table", "hash"))))
    assert(px("\"Table, HASH!\"").contains(Phrase(Seq("table", "hash")))) // folds + splits
    assert(px("\"solo\"").contains(Term("solo")))     // 1-token quote degrades
    assert(px("\"\" lorem").contains(Term("lorem")))  // empty quote dropped
    assert(px("near(a b, 3)").contains(Near(Seq("a", "b"), 3)))
    assert(px("NEAR(a b)").contains(Near(Seq("a", "b"), 10))) // default k, case-insensitive
    assert(px("near(a, 3)").contains(Term("a")))      // 1-term near degrades
    assert(px("near(a a b, 2)").contains(Near(Seq("a", "b"), 2))) // distinct terms
    assert(px("\"a b\" or c and d").contains(
      Or(Phrase(Seq("a", "b")), And(Term("c"), Term("d")))))
    assert(px("\"a b\" near(c d, 2)").contains(
      And(Phrase(Seq("a", "b")), Near(Seq("c", "d"), 2))))
    // numeric terms never collide with the internal placeholders
    assert(px("\"a b\" 0").contains(And(Phrase(Seq("a", "b")), Term("0"))))
    // `near(` must start a word: linear(x, 2) is terms, not the operator —
    // its parens read as an (associativity-only) group: linear & (x & 2)
    assert(px("linear(x, 2)").contains(
      And(Term("linear"), And(Term("x"), Term("2")))))
    // quotes inside near() args strip as punctuation
    assert(px("near(\"a b\", 2)").contains(Near(Seq("a", "b"), 2)))
    // plain queries parse identically to the reference grammar
    for (q <- Seq("Lorem", "x AND y or z", "don't*", "te*m", "or a"))
      assert(px(q) === QueryParser.parse(q), q)
    // print round-trip forms
    assert(QueryParser.print(px("\"a b\" or near(c d, 2)").get)
      === "(\"a b\") | (near(c d, 2))")
  }

  test("parseExtended: NOT and parentheses") {
    // binary NOT, both spellings (fts5 `a NOT b`; `and not` sugar)
    assert(px("a not b").contains(Diff(Term("a"), Term("b"))))
    assert(px("a AND NOT b").contains(Diff(Term("a"), Term("b"))))
    assert(px("a and not \"b c\"").contains(
      Diff(Term("a"), Phrase(Seq("b", "c")))))
    // NOT shares AND's precedence level, left-assoc: (a NOT b) AND c
    assert(px("a not b c").contains(And(Diff(Term("a"), Term("b")), Term("c"))))
    // OR binds looser than NOT
    assert(px("a not b or c").contains(Or(Diff(Term("a"), Term("b")), Term("c"))))
    // parens group and override precedence
    assert(px("(a or b) and c").contains(And(Or(Term("a"), Term("b")), Term("c"))))
    assert(px("(a or b) not (c or d)").contains(
      Diff(Or(Term("a"), Term("b")), Or(Term("c"), Term("d")))))
    assert(px("not(a or b) and c").contains( // leading NOT stray; parens still group
      And(Or(Term("a"), Term("b")), Term("c"))))
    // stray operators degrade, never error (the parse() contract)
    assert(px("not a").contains(Term("a")))
    assert(px("a not").contains(Term("a")))
    assert(px("a or not b").contains(Or(Term("a"), Term("b"))))
    assert(px("()").isEmpty)
    assert(px(") a ( b").contains(And(Term("a"), Term("b")))) // unmatched ) dropped; ( groups to end
    // a literal keyword is spelled quoted
    assert(px("\"not\"").contains(Term("not")))
    assert(px("a \"not\" b").contains(And(And(Term("a"), Term("not")), Term("b"))))
    // extended leaves compose under NOT
    assert(px("near(a b, 3) not c").contains(
      Diff(Near(Seq("a", "b"), 3), Term("c"))))
    // print form
    assert(QueryParser.print(px("a not b").get) === "(a) &! (b)")
  }
}
