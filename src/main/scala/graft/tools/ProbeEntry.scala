package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke of the driver contract: SparkEntry.entry rows > 0. */
object ProbeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    println(s"PROBE entry rows = ${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
