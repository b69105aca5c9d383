package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Fail fast when the `only` filter names unknown entries (a typo would
    * otherwise filter to nothing and print a green "0 fails" dump). */
  def validateFilter(only: Option[Set[String]], known: Set[String]): Unit =
    only.foreach { names =>
      require(names.nonEmpty, "entry filter is empty — nothing would be checked")
      val unknown = names.diff(known)
      require(unknown.isEmpty,
        s"unknown entries in filter: ${unknown.toSeq.sorted.mkString(",")} " +
          s"(known: ${known.toSeq.sorted.mkString(",")})")
    }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional comma-separated entry filter (local iteration only — the
    // driver always calls with two args = full dump). Filtered runs write
    // oracle_sql.json with ONLY the filtered keys, so point them at a
    // FRESH outDir: mixing into a full dump's dir would leave the other
    // entries' parquet stale and unchecked while the validator prints
    // green (validate_oracle flags such orphan dirs as failures).
    val only = args.lift(2).map(_.split(",").toSet)
    validateFilter(only, SparkEntry.queries.keySet)
    def wanted(name: String) = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (wanted(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => wanted(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
