package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeDedupPerf2 {
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
    val sh = docs.select($"id", TextFunctions.shingles(TextFunctions.tokens($"content"), 3).as("sh"))
    time("sh count")(sh.count())
    time("sh materialize")(sh.write.mode("overwrite").parquet("/tmp/probe_sh"))
    val shM = spark.read.parquet("/tmp/probe_sh")
    val inv = shM.select($"id", explode($"sh").as("g"))
    time("inv count")(inv.count())
    val dfreq = inv.groupBy($"g").agg(count(lit(1)).as("df"))
    time("dfreq count")(dfreq.count())
    val ranked = inv.join(dfreq, "g").withColumn("pos",
      row_number().over(org.apache.spark.sql.expressions.Window.partitionBy($"id").orderBy($"df", $"g")))
    val prefix = ranked.join(shM.select($"id", size($"sh").as("sz")), "id")
      .filter($"pos" <= floor(lit(0.2) * $"sz") + 1).select($"id", $"g")
    time("prefix count")(prefix.count())
    time("prefix materialize")(prefix.write.mode("overwrite").parquet("/tmp/probe_prefix"))
    val pM = spark.read.parquet("/tmp/probe_prefix")
    val cands = pM.as("a").join(pM.as("b"), $"a.g" === $"b.g" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
    time("cands count (materialized prefix)")(cands.count())
    val candsLive = prefix.as("a").join(prefix.as("b"), $"a.g" === $"b.g" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
    time("cands count (live prefix)")(candsLive.count())
    spark.stop()
  }
}
