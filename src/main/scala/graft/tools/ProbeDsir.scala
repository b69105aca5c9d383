package graft.tools

import graft.ext.TextStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan + stage-time probe for importanceWeights' two arms — answers "did
  * the ratio-table broadcast actually apply" (a failed hint silently lowers
  * the corpus-wide scoring join to sort-merge) and attributes wall time to
  * the count aggs vs the scoring join.
  */
object ProbeDsir {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id".cast("string").as("id"), $"text".as("content"), $"lang")
    val docs = spark.range(copies).withColumnRenamed("id", "copy").crossJoin(base)
      .repartition(64)
      .select(concat($"id", lit("_"), $"copy").as("id"), $"content", $"lang")
      .persist()
    println(s"PROBE docs = ${docs.count()}")
    val tgt = docs.filter($"lang" === "en").limit(50000)
    def run(label: String, hb: Option[Int], v: Int): Unit = {
      val t0 = System.nanoTime()
      val df = TextStats.importanceWeights(docs, tgt, vocabSize = v, hashBuckets = hb)
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange")).map(_.trim.take(110)).toSeq
      println(s"PROBE $label plan joins/exchanges:")
      joins.foreach(l => println(s"  $l"))
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label total: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    run("hashed", Some(10000), 50000)
    run("exact", None, 50000)
    // single-partition-limit theory: the bare limit() target collapses its
    // count agg's explode onto one core — pre-spread it and re-time
    val tgtSpread = tgt.repartition(32).persist()
    println(s"PROBE tgt spread rows = ${tgtSpread.count()}")
    def run2(label: String, hb: Option[Int]): Unit = {
      val t0 = System.nanoTime()
      TextStats.importanceWeights(docs, tgtSpread, vocabSize = 50000, hashBuckets = hb)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE $label total: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    run2("hashed_spread", Some(10000))
    run2("exact_spread", None)
    spark.stop()
  }
}
