package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeDedupPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("id"), $"text".as("content"))
    val sh = docs.select($"id", TextFunctions.shingles(TextFunctions.tokens($"content"), 3).as("sh"))
    val inv = sh.select($"id", explode($"sh").as("g"))
    println(s"PROBE docs=${docs.count()} inv=${inv.count()} distinct_g=${inv.select("g").distinct().count()}")
    val dfreq = inv.groupBy($"g").agg(count(lit(1)).as("df"))
    dfreq.agg(max($"df"), avg($"df"), expr("percentile_approx(df, 0.99)")).show()
    val t = 0.8
    val ranked = inv.join(dfreq, "g").withColumn("pos",
      row_number().over(org.apache.spark.sql.expressions.Window.partitionBy($"id").orderBy($"df", $"g")))
    val prefix = ranked.join(sh.select($"id", size($"sh").as("sz")), "id")
      .filter($"pos" <= floor((lit(1.0) - t) * $"sz") + 1).select($"id", $"g")
    println(s"PROBE prefix rows=${prefix.count()}")
    val prefDf = prefix.groupBy("g").agg(count(lit(1)).as("pf"))
    prefDf.agg(max($"pf"), avg($"pf"), sum($"pf" * $"pf")).show()
    val t0 = System.nanoTime()
    val cands = prefix.as("a").join(prefix.as("b"), $"a.g" === $"b.g" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
    println(s"PROBE candidates=${cands.count()} in ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
