package graft.tools

import graft.api.Collection
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-job time attribution inside the bulk `addDf` path (the a2 bench
  * entry's timed region) — answers "where do the seconds go" with Spark's
  * own job boundaries instead of guesses. Run:
  * `sbt "runMain graft.tools.ProbeAdd [sfDir]"` (grep PROBE).
  */
object ProbeAdd {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the ~100k-doc bulk input exactly like EntryQueries.bulkInputPath
    // (same metadata shape as docsFrame — {lang, source, n_chars, opt?})
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("content"),
        map_concat(
          map(lit("lang"), col("lang"), lit("source"), col("source"),
            lit("n_chars"), col("n_chars").cast("string")),
          when(col("n_chars") >= 250,
            map(lit("opt"), (col("n_chars") % 7).cast("string")))
            .otherwise(map())
        ).as("metadata"))
    val n = base.count()
    val copies = math.max(1, (100000 / math.max(1L, n)).toInt)
    val staged = java.nio.file.Files.createTempDirectory("graft-addprobe-in-").toString + "/bulk.parquet"
    spark.range(copies).withColumnRenamed("id", "copy").crossJoin(base)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(concat(col("id"), lit("_"), col("copy")).as("id"),
        col("content"), col("metadata"))
      .write.parquet(staged)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = scala.collection.concurrent.TrieMap[Int, (String, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties.getProperty("spark.job.description"))
          .orElse(js.stageInfos.lastOption.map(_.name)).getOrElse("?")
        jobs.put(js.jobId, (desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (d, t0) =>
          done.put(je.jobId, (d, je.time - t0))
        }
      }
    }

    // warm the JVM/codegen once, then measure a clean second ingest
    (1 to 2).foreach { round =>
      done.clear(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val root = java.nio.file.Files.createTempDirectory("graft-addprobe-").toString
      val t0 = System.nanoTime()
      Collection(spark, root, "bulk").addDf(spark.read.parquet(staged))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // drain listener bus
      println(f"PROBE round=$round addDf wall = $wall%.2f s, jobs = ${done.size}")
      done.toSeq.sortBy(_._1).foreach { case (id, (d, ms)) =>
        println(f"PROBE   job $id%3d ${ms / 1000.0}%6.2f s  ${d.take(110)}")
      }
    }
    spark.stop()
  }
}
