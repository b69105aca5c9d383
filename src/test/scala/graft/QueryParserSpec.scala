package graft

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
}
