package graft.tools

import graft.api.{Collection, Embedder}
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-2 probe of changed behaviors (punctuated queries, delete scoping,
  * shingle guard, embed chunking, queryFrame plan). Scratch driver, run:
  * `sbt "runMain graft.tools.ProbeR2"`.
  */
object ProbeR2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-probe-r2")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-probe-").toString

    // 1. punctuated query term now matches its tokenized form
    val c = Collection(spark, root, "punct")
    c.add(Seq("don't panic", "do panic"), ids = Some(Seq("a", "b")))
    println(s"PROBE punct: query(don't) total = ${c.query("don't").total} (want 1, doc a)")
    println(s"PROBE punct ids = ${c.query("don't").results.map(_.id)}")

    // 2. empty-string id gets a UUID (reference `i or make_id()`)
    val ids2 = c.add(Seq("uuid me"), ids = Some(Seq("")))
    println(s"PROBE empty id -> uuid len = ${ids2.head.length} (want 36)")

    // 3. cross-collection delete from a useFts=false caller must still
    // refresh the sibling FTS collection's postings
    val noFts = Collection(spark, root, "nofts", useFts = false)
    noFts.add(Seq("whatever"), ids = Some(Seq("a"))) // same id as punct/a
    noFts.delete(Seq("a"))
    println(s"PROBE delete: punct count = ${c.count()} (want 2: b + uuid doc)")
    println(s"PROBE delete: stale postings? query(don't) total = ${c.query("don't").total} (want 0)")

    // 4. shingles guard: 2-token doc with n=3 -> empty array, no crash
    val sh = Seq("two tokens", "one two three four").toDF("t")
      .select(TextFunctions.shingles(TextFunctions.tokens($"t"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toList).toList
    println(s"PROBE shingles = $sh (want List(); List(one two three, two three four))")

    // 5. embed chunking: batches bounded at EmbedBatchSize (accumulator
    // records every batch size seen executor-side)
    val batchSizes = spark.sparkContext.collectionAccumulator[Int]("embedBatches")
    class CountingEmbedder(acc: org.apache.spark.util.CollectionAccumulator[Int]) extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        acc.add(texts.size)
        texts.map(_ => Array(1f, 0f))
      }
    }
    val ec = Collection(spark, root, "emb", embedder = Some(new CountingEmbedder(batchSizes)))
    ec.add((1 to 600).map(i => s"doc $i"))
    val sizes = { import scala.jdk.CollectionConverters._; batchSizes.value.asScala.toList }
    println(s"PROBE embed batches n=${sizes.size} max=${sizes.maxOption.getOrElse(0)} (want max <= ${Collection.EmbedBatchSize}, n >= 1)")

    // 6. queryFrame plan: FTS match join must carry no builder-forced
    // broadcast hint (ResolvedHint) — AQE decides
    val qf = c.queryFrame("panic")
    val logical = qf.queryExecution.optimizedPlan.toString
    println(s"PROBE plan has ResolvedHint = ${logical.contains("ResolvedHint")} (want false for match join)")
    println(s"PROBE queryFrame rows = ${qf.count()}")

    spark.stop()
  }
}
