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

  /** The two stdout lines, as (full, headline) — pure so the contract is
    * spec-pinned (VerifySpec): line 1 is the COMPLETE per-entry map and
    * carries no `truncated` key; line 2 (printed LAST so it survives the
    * driver's ~2 KB stdout-tail capture) holds only the q-/s-/a-prefixed
    * headline subset, marked `"truncated":true` so a consumer taking the
    * first parsed `{"metric":"total"}` line can never mistake the partial
    * map for the complete one, and points at the durable full map via
    * `full_map_file` + `full_map_sha256`.
    */
  def summaryLines(results: Seq[(String, Double)], errors: Seq[(String, String)],
                   calib: Double, sfDir: String, outFile: String): (String, String) = {
    val qs = results.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = math.round(results.collect { case (_, v) if v >= 0 => v }.sum * 1000) / 1000.0
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"calib_sec":$calib,"sf":"${esc(sfDir)}"}"""
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(full.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val headlineQs = results.filter { case (k, _) =>
      k.startsWith("q") || k.startsWith("s") || k.startsWith("a") }
      .map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val headline =
      s"""{"metric":"total","value":$total,"unit":"sec","truncated":true,""" +
      s""""queries":$headlineQs,"n_entries":${results.size},"n_errors":${errors.size},""" +
      s""""calib_sec":$calib,"sf":"${esc(sfDir)}",""" +
      s""""full_map_file":"${esc(outFile)}","full_map_sha256":"$digest"}"""
    (full, headline)
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
    val (json, headline) =
      summaryLines(results, errors.toSeq, calib, sfDir, outFile)
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () } // read-only cwd must not fail the bench
    // The headline line prints LAST so it survives the driver's ~2 KB
    // stdout-tail capture (contract + truncated marker: [[summaryLines]]).
    println(headline)
    spark.stop()
  }
}
