package graft.tools

import graft.api.Collection
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives streaming ingestion end-to-end with a real file stream: parquet
  * files land in a directory, the collection indexes them continuously,
  * FTS queries observe the updates. Run: `sbt "runMain graft.tools.ProbeStream"`.
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val inDir = java.nio.file.Files.createTempDirectory("graft-streamin-").toString
    val root = java.nio.file.Files.createTempDirectory("graft-streamroot-").toString
    val c = Collection(spark, root, "live")

    // batch 1 lands before the stream starts
    Seq(("a", "alpha doc"), ("b", "beta doc")).toDF("id", "content")
      .write.mode("append").parquet(inDir)
    val stream = spark.readStream
      .schema("id STRING, content STRING")
      .parquet(inDir)
    val q = c.streamIngest(stream).start()
    q.processAllAvailable()
    println(s"PROBE after batch1: count=${c.count()} alpha=${c.query("alpha").total}")

    // batch 2: upsert a + new doc c
    Seq(("a", "gamma doc"), ("c", "delta doc")).toDF("id", "content")
      .write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()
    println(s"PROBE after batch2: count=${c.count()} alpha=${c.query("alpha").total} gamma=${c.query("gamma").total} doc=${c.query("doc").total}")
    spark.stop()
  }
}
