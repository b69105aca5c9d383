package graft.tools

import graft.api.Collection
import graft.ext.{Ann, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf0.1 corpus ~200x (1M docs, distinct ids,
  * copy-perturbed content) and 50x (100k vectors), run the heavy operators,
  * and report wall times — evidence that the plans stay shuffle-bound with
  * no driver-side cliffs as data grows. Run:
  * `sbt "runMain graft.tools.ProbeScale [copies]"`.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 200
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("id"), $"text".as("content"),
        map(lit("lang"), $"lang").as("metadata"))
    // copy-specific 30-token suffix: cross-copy jaccard drops below 0.8 so
    // the qualifying near-dup pair count stays ~25 * copies, not O(copies^2)
    val suffix = concat_ws(" ", (1 to 30).map(k => concat(lit(s"cp"), $"copy", lit(s"x$k"))): _*)
    // the crossJoin of a broadcast range otherwise yields ~1 output
    // partition and serializes the whole ingest onto one core
    val docs = spark.range(copies).withColumnRenamed("id", "copy").crossJoin(base)
      .repartition(64)
      .select(concat($"id", lit("_"), $"copy").as("id"),
        concat($"content", lit(" "), suffix).as("content"), $"metadata")

    val root = java.nio.file.Files.createTempDirectory("graft-scale-").toString
    val c = Collection(spark, root, "big")
    val n = time(s"bulk ingest+index ${copies}x (~${5000L * copies} docs)")(
      { c.addDf(docs); c.count() })
    println(s"PROBE   docs = $n")

    time("FTS AND query")(println(s"PROBE   hits = ${c.queryFrame("table scan").count()}"))
    time("BM25 ranked query")(println(s"PROBE   hits = ${c.queryFrame("customer stream").count()}"))
    time("metadata + FTS conj")(println(s"PROBE   hits = ${c.queryFrame("table", where = Map("lang" -> "en")).count()}"))

    val bigDocs = c.docs()
    time("minhash dedup @1M")(println(s"PROBE   pairs = ${Dedup.minHashDupPairs(bigDocs, threshold = 0.8).count()}"))
    time("ngram prefix-join dedup @1M")(println(s"PROBE   pairs = ${Dedup.ngramJaccardPairs(bigDocs, threshold = 0.8).count()}"))
    time("simhash dedup @1M")(println(s"PROBE   pairs = ${Dedup.simHashDupPairs(bigDocs, maxHamming = 3).count()}"))

    val vbase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".cast("string").as("id"), $"embedding")
    val vecs = spark.range(50).withColumnRenamed("id", "copy").crossJoin(vbase)
      .repartition(32)
      .select(concat($"id", lit("_"), $"copy").as("id"), $"embedding")
    println(s"PROBE vectors = ${vecs.count()}")
    val qs = (0 until 5).map(i => i.toString ->
      vbase.filter($"id" === i.toString).select($"embedding").head().getSeq[Float](0).toSeq)
    time("exact ANN top-10 x5 @100k")(Ann.exactTopK(vecs, qs, 10).count())
    time("LSH ANN top-10 x5 @100k")(Ann.lshTopK(vecs, qs, 10, numTables = 16, numPlanes = 4, dim = 64).count())
    spark.stop()
  }
}
