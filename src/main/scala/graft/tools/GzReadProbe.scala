package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot timing of [[graft.sources.WarcGzip.read]] over an existing
  * `.warc.gz` directory: `runMain graft.tools.GzReadProbe <path>` — the
  * iterate-on-the-reader loop without re-writing the 2M-member fixture.
  */
object GzReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = graft.sources.WarcGzip.read(spark, args(0))
      .agg(count(lit(1)), sum(length(col("body")))).head()
    println(f"GZPROBE n=${r.getLong(0)} chars=${r.getLong(1)} secs=${(System.nanoTime()-t0)/1e9}%.1f")
    // pruned count: DSv2 hands the scan an EMPTY required schema — no
    // payload decode, no record strings, just member validation
    val t1 = System.nanoTime()
    val n = graft.sources.WarcGzip.read(spark, args(0)).count()
    println(f"GZPROBE pruned count=$n secs=${(System.nanoTime()-t1)/1e9}%.1f")
    spark.stop()
  }
}
