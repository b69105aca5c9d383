package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Verify entry filter must fail fast on unknown names: a typo'd
  * `only` list would otherwise filter to nothing and the dump would print
  * a green "checked 0 entries; fails: 0".
  */
class VerifySpec extends AnyFunSuite {

  private val known = Set("q1_fts_and", "x15_stream_window", "s7_count")

  test("no filter passes through") {
    Verify.validateFilter(None, known)
  }

  test("known names pass") {
    Verify.validateFilter(Some(Set("q1_fts_and", "s7_count")), known)
  }

  test("unknown names fail fast, naming the offenders") {
    val e = intercept[IllegalArgumentException] {
      Verify.validateFilter(Some(Set("q1_fts_and", "q1_fts_adn")), known)
    }
    assert(e.getMessage.contains("q1_fts_adn"))
    assert(!e.getMessage.contains("unknown entries in filter: q1_fts_and"))
  }

  test("empty filter set fails (would check nothing)") {
    intercept[IllegalArgumentException] {
      Verify.validateFilter(Some(Set.empty), known)
    }
  }

  test("driver contract: flagship entry returns rows and every oracle key has a query") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0) // the driver's smoke check
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.nonEmpty)
  }
}
