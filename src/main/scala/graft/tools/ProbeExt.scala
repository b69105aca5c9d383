package graft.tools

import graft.ext.{Ann, ByteStatsDecoder, Dedup, Multimodal, Pipeline, TextStats}
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives every ext/ operator end-to-end against the real sf0.01 testdata.
  * Run: `sbt "runMain graft.tools.ProbeExt"` (grep PROBE).
  */
object ProbeExt {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("id"), $"text".as("content"))
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".cast("string").as("id"), $"embedding")

    val mh = Dedup.minHashDupPairs(docs, threshold = 0.8)
    println(s"PROBE minhash pairs >= 0.8: ${mh.count()}")
    mh.orderBy(desc("jaccard")).limit(3).collect()
      .foreach(r => println(f"PROBE   ${r.getString(0)}%s ~ ${r.getString(1)}%s j=${r.getDouble(2)}%.4f"))

    val ng = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
    println(s"PROBE exact ngram pairs >= 0.8: ${ng.count()} (minhash must equal this if recall=1)")

    val sh = Dedup.simHashDupPairs(docs, maxHamming = 3)
    println(s"PROBE simhash pairs hamming<=3: ${sh.count()}")

    val q = embs.filter($"id" === "0").select($"embedding").head().getSeq[Float](0)
    val exact = Ann.exactTopK(embs, Seq("0" -> q), k = 10)
    val qs = (0 until 10).map(i => embs.filter($"id" === i.toString)
      .select($"embedding").head().getSeq[Float](0)).zipWithIndex
      .map { case (v, i) => (i.toString, v.toSeq) }
    val exactB = Ann.exactTopK(embs, qs, k = 10)
    val approxB = Ann.lshTopK(embs, qs, k = 10, numTables = 16, numPlanes = 4, dim = 64)
    println(f"PROBE ann recall@10 (16 tables x 4 planes) = ${Ann.recallAtK(exactB, approxB)}%.3f")

    val lang = TextStats.langId(docs).groupBy("pred_lang").count().collect()
    println(s"PROBE langid dist = ${lang.map(r => r.getString(0) -> r.getLong(1)).toList}")
    val qual = TextStats.quality(docs).agg(avg("quality")).head().getDouble(0)
    println(f"PROBE avg quality = $qual%.4f")
    val fp = TextStats.fingerprint(docs).select("fingerprint").distinct().count()
    println(s"PROBE distinct fingerprints = $fp / ${docs.count()}")

    val rep = TextStats.repetition(docs, n = 2)
      .agg(max("top_ngram_frac")).head().getDouble(0)
    println(f"PROBE max top-2gram frac = $rep%.4f")

    val full = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string").as("id"), $"text".as("content"), $"source", $"lang")
    val packed = Pipeline.packSequences(docs, budget = 512, shards = 8)
    println(s"PROBE pack bins = ${packed.select("shard", "bin").distinct().count()}, docs = ${packed.count()}")
    val sampled = Pipeline.sampleStratified(full, "lang", Map("en" -> 0.5), defaultFraction = 0.1)
    println(s"PROBE stratified sample kept = ${sampled.count()} / ${full.count()}")
    val mixed = Pipeline.mixCorpora(full, "source",
      Map("src1" -> 0.5, "src2" -> 0.5), budgetTokens = 4000)
    println(s"PROBE mixture kept = ${mixed.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toList}")
    val decon = Pipeline.decontaminate(full.filter($"source" =!= "src0"),
      full.filter($"source" === "src0"), n = 8)
    println(s"PROBE decontaminated kept = ${decon.count()}")

    val media = docs.withColumn("modality", lit("text"))
      .withColumn("media", $"content".cast("binary"))
    val feats = Multimodal.featurize(media, ByteStatsDecoder)
    println(s"PROBE multimodal featurized rows = ${feats.filter(size($"features") === 3).count()}")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(($"ts" / 1000).cast("long")))
    val win = EventStreams.windowAgg(events)
    println(s"PROBE event windows = ${win.count()}, head = ${win.orderBy("window_start", "event_type").limit(2).collect().toList}")
    spark.stop()
  }
}
