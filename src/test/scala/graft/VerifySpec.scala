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

  private def parseJson(line: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)

  test("bench stdout contract: complete total line LAST, within the tail budget") {
    // The driver keeps a ~2000-char stdout tail and parses the LAST
    // complete {"metric":"total"} JSON line in it (r19 verdict #1: the old
    // truncated-headline-last scheme yielded parsed:null for two rounds).
    // Exercise the REAL entry name set so the budget math is pinned against
    // the actual suite, with realistic values (deterministic pseudo-times).
    val names = SparkEntry.queries.keySet.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (math.round(((i % 40) * 0.37 + 0.05) * 1000) / 1000.0)
    }
    val lines = Bench.stdoutLines(results, Nil, calib = 1.4,
      sfDir = "/root/testdata/sf0.1", outFile = "BENCH_last.json")

    // line 1: the complete map, every entry present, valid JSON
    val full = lines.head
    val fullJson = parseJson(full)
    assert(fullJson.get("metric").asText == "total")
    assert(fullJson.get("queries").size == results.size)
    assert(!full.contains("truncated"))

    // middle: deterministic group lines reconstruct the full map exactly
    val groupLines = lines.filter(_.startsWith("""{"metric":"queries""""))
    val merged = groupLines.flatMap { l =>
      val q = parseJson(l).get("queries")
      val it = q.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(merged == names, "group lines must cover all entries once, in name order")
    assert(groupLines.forall(_.length < 1200), "group lines must be individually tail-sized")

    // sha pointer line pins the durable full map
    val shaLine = lines(lines.size - 2)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(full.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(shaLine == s"""{"metric":"full_map","file":"BENCH_last.json","sha256":"$sha"}""")

    // LAST line: complete parseable total within the tail budget
    val totalLine = lines.last
    assert(totalLine.getBytes("UTF-8").length <= Bench.TotalLineMaxBytes,
      s"total line is ${totalLine.length} bytes")
    val t = parseJson(totalLine)
    assert(t.get("metric").asText == "total")
    assert(t.get("unit").asText == "sec")
    assert(t.get("n_entries").asInt == results.size)
    assert(t.get("n_errors").asInt == 0)
    assert(!totalLine.contains("truncated"))
    val shown = t.get("queries").size
    assert(shown + t.get("queries_omitted").asInt == results.size)
    assert(shown > 50, s"budget should admit a substantial subset, got $shown")
    // priority: the most expensive entry is in, the cheapest is the first out
    val byValue = results.sortBy { case (k, v) => (-v, k) }
    assert(t.get("queries").has(byValue.head._1), "most expensive entry must be shown")
    if (t.get("queries_omitted").asInt > 0)
      assert(!t.get("queries").has(byValue.last._1), "cheapest entry drops first")
    // shown entries are emitted in name order (deterministic line layout)
    val shownNames = { val it = t.get("queries").fieldNames()
      val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next(); b.result() }
    assert(shownNames == shownNames.sorted)
  }

  test("bench stdout contract: errors surface in the total line, capped") {
    val results = Seq("a1_build_index" -> 1.5, "q1_fts_and" -> 0.25,
      "x2_dedup_minhash" -> 3.0, "s7_count" -> 0.1, "x9_broken" -> -1.0)
    val errs = Seq("x9_broken" -> "boom \"quoted\"", "x8_also" -> "kaput", "x7_more" -> "dead")
    val lines = Bench.stdoutLines(results, errs, calib = 1.4,
      sfDir = "/root/testdata/sf0.1", outFile = "BENCH_last.json")
    val fullJson = parseJson(lines.head)
    assert(fullJson.get("errors").size == 3)
    assert(fullJson.get("errors").get("x9_broken").asText == "boom \"quoted\"")
    val t = parseJson(lines.last)
    assert(t.get("n_errors").asInt == 3)
    assert(t.get("errors").size == 2, "total line caps shown errors at 2")
    assert(t.get("value").asDouble == 4.85, "errored entries (-1) excluded from total")
    // a clean run carries no errors object on the total line
    val clean = Bench.stdoutLines(results.filterNot(_._2 < 0), Nil, 1.4,
      "/root/testdata/sf0.1", "BENCH_last.json")
    assert(!parseJson(clean.last).has("errors"))
    assert(parseJson(clean.last).get("n_errors").asInt == 0)
  }
}
