package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 diagnosis harness: times the x4b_dedup_clusters path end-to-end
  * the way Bench does (noop write of the final frame), isolating pair
  * generation from clustering. Root cause found with this probe: iterative
  * window+distinct rounds multiply the logical plan ~8×/round (5.9 MB of
  * plan text after 2 rounds at sf0.1) — persist() does not truncate
  * lineage, so final-plan re-optimization dominated. Fixed with
  * checkpoint/localCheckpoint in [[Dedup.dupClusters]].
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

    // warm the parquet/scan path once so the timed runs measure plan cost
    docs.write.format("noop").mode("overwrite").save()

    t("x4_dedup_ngram (pairs only, noop write)") {
      Dedup.ngramJaccardPairs(docs, threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    t("x4b_dedup_clusters (pairs + clusters, noop write)") {
      Dedup.dupClusters(Dedup.ngramJaccardPairs(docs, threshold = 0.8))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
