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

  test("bench two-line contract: only the headline line is marked truncated") {
    // A consumer that takes the FIRST parsed {"metric":"total"} line must
    // be able to tell the complete map (line 1, no `truncated` key) from
    // the tail-survivable q*/s*/a* subset (line 2, "truncated":true with
    // the full map's file + sha256 pointer).
    val results = Seq("a1_build_index" -> 1.5, "q1_fts_and" -> 0.25,
      "x2_dedup_minhash" -> 3.0, "s7_count" -> 0.1)
    val (full, headline) = Bench.summaryLines(
      results, Seq("x9_broken" -> "boom \"quoted\""), calib = 1.4,
      sfDir = "/root/testdata/sf0.1", outFile = "BENCH_last.json")
    for (line <- Seq(full, headline)) { // both parse as the driver contract
      assert(line.startsWith("""{"metric":"total","value":4.85,"unit":"sec""""), line)
      assert(line.endsWith("}") && !line.contains("\n"))
    }
    assert(!full.contains("truncated"), "full line must NOT carry the marker")
    assert(full.contains(""""x2_dedup_minhash":3.0"""))
    assert(full.contains(""""x9_broken":"boom \"quoted\""""))
    assert(headline.contains(""""truncated":true"""))
    assert(!headline.contains("x2_dedup_minhash"), "headline is the q/s/a subset")
    assert(headline.contains(""""q1_fts_and":0.25"""))
    assert(headline.contains(""""n_entries":4""") && headline.contains(""""n_errors":1"""))
    assert(headline.contains(""""full_map_file":"BENCH_last.json""""))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(full.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(headline.contains(s""""full_map_sha256":"$sha""""),
      "pointer must fingerprint the exact full line")
  }
}
