package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Explain-plan audit of the corpus-assembly operators (`ext.Pipeline`):
  * prints the formatted physical plans so the shuffle/broadcast shape is
  * reviewable — x20 must broadcast the bench gram set (corpus side never
  * shuffles), x18 must be ONE exchange + streaming window, x19 must be a
  * bare scan.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("content"), col("source"))
    val hits = graft.ext.Pipeline.contaminationHits(
      all.filter(col("source") =!= "src0"), all.filter(col("source") === "src0"), n = 8)
    println("=== x20 contaminationHits ===")
    hits.explain("formatted")
    val packed = graft.ext.Pipeline.packSequences(
      all.select("id", "content"), budget = 512, shards = 8)
    println("=== x18 packSequences ===")
    packed.explain("formatted")
    val sampled = graft.ext.Pipeline.sampleStratified(
      all.select(col("id"), col("source")), "source", Map("src1" -> 0.5))
    println("=== x19 sampleStratified ===")
    sampled.explain("formatted")
    // IVF-PQ probe: the literal `cluster IN (…)` must reach the annivfpq
    // parquet scan as a PushedFilter (row-group pruning — the nprobe/k
    // scan-fraction property), and the ADC/rerank must be shuffle-free up
    // to the bounded top-candK cut.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft-plancheck-").toString
    val c = graft.api.Collection(spark, root, "vecs", useFts = false)
    c.addDf(e.withColumn("content", lit("")))
    c.createVectorIndex(kind = "ivfpq", numCentroids = 16, nprobe = 4,
      m = 16, candK = 50, iters = 4, maxSample = 5000)
    val q = e.limit(1).select("embedding").head().getSeq[Float](0).toSeq
    println("=== x6d ivfpq vectorTopK ===")
    c.vectorTopK(Seq("q0" -> q), 10).explain("formatted")
    spark.stop()
  }
}
