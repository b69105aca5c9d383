package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * A failing query is reported with value -1 AND an entry in "errors"
  * (so a broken query can't masquerade as a fast one).
  */
object Bench {

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Byte budget for the FINAL `{"metric":"total"}` stdout line. The driver
    * keeps only a ~2000-char stdout TAIL and parses the last complete
    * `{"metric":"total"}` JSON line inside it; sbt appends one
    * `[success] Total time: ...` line (~70 chars) after us and prefixes each
    * line with `[info] ` (7 chars), so the line must stay comfortably under
    * 2000 − ~80. 1800 leaves slack for a longer sbt epilogue.
    */
  val TotalLineMaxBytes = 1800

  /** Entries per `{"metric":"queries"}` group line (deterministic chunking
    * of the name-sorted full map).
    */
  val GroupSize = 25

  /** All stdout lines, in print order — pure so the contract is spec-pinned
    * (VerifySpec). The r19 scheme printed the complete map FIRST (it
    * scrolled out of the driver's ~2 KB stdout-tail capture) and a
    * `"truncated":true` q/s/a headline LAST (a consumer correctly refuses a
    * partial map marked truncated), so the driver had NO per-query ground
    * truth for two rounds (PERF_r18/r19 `per_query: {}`, `parsed: null`).
    * The r20 contract (the r19 verdict's #1 item):
    *
    *   1. the COMPLETE single-line map (also durably written to `outFile`),
    *   2. the same map again as deterministic per-group complete JSON lines
    *      (`{"metric":"queries","group":i,"of":n,...}`, entries in name
    *      order, fixed [[GroupSize]] chunks — each line individually
    *      parseable, so a consumer with a longer tail window can merge
    *      groups back into the full map),
    *   3. `{"metric":"full_map",...}` with the durable file + sha pointer,
    *   4. LAST — the only line guaranteed inside the tail window — a
    *      complete, parseable `{"metric":"total"}` line sized to
    *      [[TotalLineMaxBytes]]: total/value/n_entries cover ALL entries;
    *      the `queries` map carries as many per-entry values as fit the
    *      budget, picked by (value desc, name asc) priority — the expensive
    *      entries are the ones a perf comparison needs; sub-noise-floor
    *      entries drop first — and emitted in name order.
    *      `queries_omitted` counts what did not fit (the full map is in
    *      lines 1-2 and the durable file). No `truncated` key: the line is
    *      a complete record of the run's totals, and the omitted per-entry
    *      values are recoverable via the sha-pinned file.
    *
    * All 205 entries can never fit the tail window directly: the name-sorted
    * compact map alone is ~5.3 KB (measured, BENCH_last.json r19).
    */
  def stdoutLines(results: Seq[(String, Double)], errors: Seq[(String, String)],
                  calib: Double, sfDir: String, outFile: String): Seq[String] = {
    def ent(kv: (String, Double)) = s""""${esc(kv._1)}":${kv._2}"""
    val byName = results.sortBy(_._1)
    val qs = byName.map(ent).mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = math.round(results.collect { case (_, v) if v >= 0 => v }.sum * 1000) / 1000.0
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"calib_sec":$calib,"sf":"${esc(sfDir)}"}"""
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(full.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val groups = byName.grouped(GroupSize).toSeq
    val groupLines = groups.zipWithIndex.map { case (g, i) =>
      s"""{"metric":"queries","group":${i + 1},"of":${groups.size},"queries":${g.map(ent).mkString("{", ",", "}")}}"""
    }
    val shaLine = s"""{"metric":"full_map","file":"${esc(outFile)}","sha256":"$digest"}"""
    // Total line: scaffold first (errors kept only when non-empty — an
    // errored run must surface them even tail-only; capped at 2 entries so
    // a pathological error burst cannot evict every query value), then fill
    // the remaining budget with entries by (value desc, name asc) priority.
    val errPart =
      if (errors.isEmpty) ""
      else {
        val shown = errors.sortBy(_._1).take(2)
          .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
        s""""errors":$shown,"""
      }
    def scaffold(qsPart: String, omitted: Int) =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsPart,""" +
      s""""n_entries":${results.size},"n_errors":${errors.size},$errPart""" +
      s""""calib_sec":$calib,"sf":"${esc(sfDir)}","queries_omitted":$omitted}"""
    val fixedBytes = scaffold("{}", results.size).getBytes("UTF-8").length
    var used = fixedBytes
    val selected = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    for (kv <- results.sortBy { case (k, v) => (-v, k) }) {
      val add = ent(kv).getBytes("UTF-8").length + 1 // +1 for the comma
      if (used + add <= TotalLineMaxBytes) { selected += kv; used += add }
    }
    val totalLine = scaffold(
      selected.sortBy(_._1).map(ent).mkString("{", ",", "}"),
      results.size - selected.size)
    (full +: groupLines) ++ Seq(shaLine, totalLine)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: JIT/codegen/scan-path initialization costs land here
    // instead of inflating whichever entry runs first (a1, alphabetically).
    // Reads a real (small) parquet + runs one shuffle + one noop write — the
    // three one-time paths every entry exercises.
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // Fixed calibration workload (data-independent: range + shuffle + agg).
    // The host this runs on shows multi-x wall-clock variance between runs
    // (VM neighbors); calib_sec lets any two bench artifacts be compared on
    // a noise-normalized basis: ratio = calib_a / calib_b.
    val calib = {
      val t0 = System.nanoTime()
      import org.apache.spark.sql.functions._
      spark.range(20000000L)
        .select((col("id") % 997).as("k"), col("id"))
        .groupBy("k").agg(sum(col("id")).as("s"))
        .agg(sum(col("s"))).head()
      math.round((System.nanoTime() - t0) / 1e7) / 100.0
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // optional args = entry-name filter for local iteration; the driver
    // passes none and times everything
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // label the entry's jobs (guide §1.5) — groups the whole entry in any
      // UI/listener trace; zero cost when no listener is attached
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val ok =
        // noop write, not count(): count() lets Catalyst prune every
        // unreferenced projection (a shaping query would time as a bare
        // scan); the noop sink materializes all output columns of the real
        // plan and discards them.
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // 3 decimals: ms precision is beyond this host's noise floor anyway,
      // and the shorter line survives more of the driver's stdout-tail
      // truncation (BENCH_r08.json kept only a 2000-char tail)
      name -> (if (ok) math.round(sec * 1000) / 1000.0 else -1.0)
    }
    // Durable copy of the full line: the driver's per-round artifact keeps
    // only a truncated stdout tail ("parsed": null in BENCH_r07/r08), so the
    // full per-entry map was unrecoverable from the committed artifact. The
    // cwd file rides the end-of-round commit instead. FILTERED runs (local
    // iteration args) write their own file — BENCH_last.json stays the
    // latest FULL-suite record (r10 ADVICE: a 4-entry adjudication run had
    // replaced the 160-entry snapshot).
    val outFile = if (args.isEmpty) "BENCH_last.json" else "BENCH_last_filtered.json"
    val lines = stdoutLines(results, errors.toSeq, calib, sfDir, outFile)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      lines.head.getBytes("UTF-8"))
    catch { case _: Throwable => () } // read-only cwd must not fail the bench
    // Print order is the contract ([[stdoutLines]]): complete map first,
    // group lines, sha pointer, and the budget-sized complete total line
    // LAST so it survives the driver's ~2 KB stdout-tail capture.
    lines.foreach(println)
    spark.stop()
  }
}
