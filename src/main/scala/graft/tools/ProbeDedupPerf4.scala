package graft.tools

import graft.ext.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeDedupPerf4 {
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
    docs.count()

    val sh = docs.select($"id", TextFunctions.shingles(TextFunctions.tokens($"content"), 3).as("sh"))
    val prefLen = (floor(lit(0.2) * size($"sh") + lit(1e-9)) + 1).cast("int")
    val hashed = array_sort(transform($"sh", g => struct(xxhash64(g).as("h"), g.as("g"))))
    val prefix = sh.select($"id", explode(slice(hashed, lit(1), prefLen)).as("hg"))
      .select($"id", $"hg.g".as("g"))
    time("prefix scan only")(prefix.count())
    time("prefix scan again")(prefix.count())
    val cands = prefix.as("a").join(prefix.as("b"), $"a.g" === $"b.g" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
    time("candidates")(println("  cands=" + cands.count()))
    time("full op run1")(println("  n=" + Dedup.ngramJaccardPairs(docs, threshold = 0.8).count()))
    time("full op run2")(println("  n=" + Dedup.ngramJaccardPairs(docs, threshold = 0.8).count()))
    time("minhash run1")(println("  n=" + Dedup.minHashDupPairs(docs, threshold = 0.8).count()))
    time("minhash run2")(println("  n=" + Dedup.minHashDupPairs(docs, threshold = 0.8).count()))
    spark.stop()
  }
}
