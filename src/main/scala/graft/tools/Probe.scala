package graft.tools

import graft.api.Collection
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Edge-case probes against the public API on real data (verification aid). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-probe-").toString
    val c = Collection(spark, root, "docs")
    c.addDf(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("content"),
        map(lit("lang"), col("lang"), lit("n_chars"), col("n_chars").cast("string")).as("metadata")))

    println(s"PROBE single-term 'vector' total = ${c.query("vector").total}")
    println(s"PROBE prefix 'vec*' total = ${c.query("vec*").total}")
    println(s"PROBE unknown term total = ${c.query("zzzqqq").total}")
    println(s"PROBE empty query (get) total = ${c.query("").total}")
    val past = c.query("vector", offset = 100000, limit = 5)
    println(s"PROBE offset past end: results=${past.results.size} total=${past.total}")
    val neg = c.query("vector", limit = -1)
    println(s"PROBE negative limit treated as unlimited: ${neg.results.size} of ${neg.total}")
    println(s"PROBE where on missing key total = ${c.get(where = Map("nope" -> "x")).total}")
    val weird = c.query("vector OR")
    println(s"PROBE trailing operator total = ${weird.total}")
    try { c.get(where = Map("k" -> Map("$bad" -> "x"))) }
    catch { case e: IllegalArgumentException => println(s"PROBE invalid op -> ${e.getMessage}") }
    // double-add same ids (idempotent upsert) then delete twice
    c.add(Seq("probe doc"), ids = Some(Seq("p1")))
    c.add(Seq("probe doc"), ids = Some(Seq("p1")))
    println(s"PROBE double add count(p1 docs) = ${c.query("probe").total}")
    c.delete(Seq("p1")); c.delete(Seq("p1"))
    println(s"PROBE after double delete = ${c.query("probe").total}")
    spark.stop()
  }
}
