package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeDedupPerf3 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("id"), $"text".as("content"))
    time("warmup docs")(docs.count())
    time("ngramJaccardPairs")(println("  n=" + Dedup.ngramJaccardPairs(docs, threshold = 0.8).count()))
    time("minHashDupPairs")(println("  n=" + Dedup.minHashDupPairs(docs, threshold = 0.8).count()))
    time("simHashDupPairs")(println("  n=" + Dedup.simHashDupPairs(docs, maxHamming = 3).count()))
    spark.stop()
  }
}
