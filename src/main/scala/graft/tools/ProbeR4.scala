package graft.tools

import graft.ext.{Ann, Dedup, Ivf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 diagnosis harness.
  *
  * 1. Times the x4b_dedup_clusters path end-to-end the way Bench does (noop
  *    write). Root cause found here: iterative window+distinct rounds
  *    multiplied the logical plan ~8×/round (5.9 MB of plan text after 2
  *    rounds at sf0.1) — persist() does not truncate lineage, so final-plan
  *    re-optimization dominated; fixed with checkpoint in
  *    [[Dedup.dupClusters]] (54.7 s → ~3 s).
  * 2. IVF recall/latency sweep to pick the x6b entry parameters.
  */
object ProbeR4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("content"))
    docs.write.format("noop").mode("overwrite").save() // warm scan path

    t("x4b_dedup_clusters (pairs + clusters, noop write)") {
      Dedup.dupClusters(Dedup.ngramJaccardPairs(docs, threshold = 0.8))
        .write.format("noop").mode("overwrite").save()
    }

    // --- IVF sweep ---------------------------------------------------------
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    val nVec = e.count()
    println(s"[probe] embeddings: $nVec")
    val qs = e.filter(col("id").isin((0 until 5).map(_.toString): _*))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toSeq).toSeq
    val exact = Ann.exactTopK(e, qs, k = 10).persist()
    exact.count()
    for ((k, nprobe) <- Seq((16, 8), (16, 10), (16, 12))) {
      val ix = t(s"ivf build k=$k")(Ivf.build(e, k = k, iters = 5, maxSample = 20000))
      val sizes = ix.assignments.groupBy("cluster").count()
        .agg(min("count"), max("count"), count(lit(1))).collect()(0)
      val approx = t(s"ivf probe k=$k nprobe=$nprobe")(ix.topK(e, qs, 10, nprobe = nprobe))
      val rec = Ann.recallAtK(exact, approx)
      println(f"[probe] IVF k=$k nprobe=$nprobe recall@10=$rec%.3f clusters(min/max/n)=$sizes")
    }
    spark.stop()
  }
}
