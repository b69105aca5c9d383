package graft.tools

import graft.api.{Collection, Embedder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end demo/driver of the public Collection API against the real
  * sf0.001 testdata — the SURVEY §7.3 "minimum end-to-end slice" query. Run:
  * `sbt "runMain graft.tools.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-demo-").toString
    val c = Collection(spark, root, "docs")

    // Ingest documents.parquet: metadata = {lang, source, n_chars}.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text").as("content"),
        map(lit("lang"), col("lang"), lit("source"), col("source"),
            lit("n_chars"), col("n_chars").cast("string")).as("metadata"))
    c.addDf(docs)
    println(s"count = ${c.count()}")

    // SURVEY §7.3 flagship: parser OR + postings union + string & numeric
    // metadata filters + DESC NULLS FIRST sort + pagination + total.
    val r = c.query("filter or stream", limit = 10,
      where = Map("lang" -> "en", "n_chars" -> Map("$gt" -> 100)),
      orderBy = Seq("-n_chars"))
    println(s"flagship total = ${r.total}")
    r.results.foreach(h => println(
      s"  id=${h.id} n_chars=${h.metadata("n_chars")} lang=${h.metadata("lang")} " +
      s"rank=${h.rank.map(x => f"$x%.4f")} content=${h.content.take(40)}…"))

    // FTS relevance path (BM25 order).
    val fts = c.query("vector index", limit = 5)
    println(s"fts 'vector index' total = ${fts.total}")
    fts.results.foreach(h => println(f"  id=${h.id} bm25=${h.rank.get}%.4f"))

    // Extended query surface: phrase adjacency + NEAR windows inside the
    // boolean grammar, plus the standalone phrase/near APIs.
    val ph = c.phraseSearch("table hash").count()
    val nr = c.nearSearch("table hash", maxSpan = 3).count()
    val ext = c.extendedQueryFrame("\"table hash\" or near(slow key, 4)").count()
    println(s"phrase 'table hash' = $ph, near(3) = $nr, extended = $ext")

    // The same store from plain SQL via table functions.
    graft.plans.GraftFunctions.registerTables(spark)
    val sqlN = spark.sql(
      s"SELECT count(*) FROM graft_search('$root', 'docs', 'filter or stream')")
      .head().getLong(0)
    println(s"graft_search via SQL = $sqlN")

    // Vector search on the embeddings table via a hash-stub embedder.
    object StubEmbedder extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        texts.map { t =>
          val rnd = new scala.util.Random(t.hashCode)
          Array.fill(64)(rnd.nextGaussian().toFloat)
        }
    }
    val vc = Collection(spark, root, "vdocs", embedder = Some(StubEmbedder))
    vc.add(Seq("alpha doc", "beta doc", "gamma doc", "delta doc"))
    val vr = vc.query("alpha doc", vectorSearch = true, limit = 3)
    println(s"vector total = ${vr.total}")
    vr.results.foreach(h => println(f"  content=${h.content} sim=${h.rank.get}%.4f"))

    // --- training-data pipeline slice over the same corpus -----------------

    // Faceted composition of the collection's metadata
    println("facets:")
    c.facets(Seq("lang", "source"), k = 3).collect().foreach(f =>
      println(f"  ${f.getString(0)}%-7s ${String.valueOf(f.getString(1))}%-8s " +
        f"n=${f.getLong(2)} share=${f.getDouble(3)}%.3f rank=${f.getInt(4)}"))

    // DSIR importance weights: English slice as the target distribution
    val dd = docs.select(col("id"), col("content"),
      element_at(col("metadata"), "lang").as("lang"))
    val dsir = graft.ext.TextStats.importanceWeights(
      dd, dd.filter(col("lang") === "en"), vocabSize = 500)
    println("dsir top target-like docs:")
    dsir.orderBy(col("logratio").desc).limit(3).collect().foreach(r =>
      println(f"  id=${r.getString(0)} n_tokens=${r.getLong(1)} logratio=${r.getDouble(2)}%.4f"))

    // PageRank centrality over the exact 5-NN semantic graph
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("id"), col("embedding"))
    val edges = graft.ext.Ann.exactTopKAll(emb,
        emb.select(col("id").as("qid"), col("embedding").as("qvec")), k = 6)
      .filter(col("qid") =!= col("id"))
      .select(col("qid").as("src"), col("id").as("dst"))
    println("pagerank hubs:")
    graft.ext.Graphs.pageRank(edges, iterations = 5)
      .orderBy(col("rank").desc).limit(3).collect().foreach(r =>
        println(f"  vec=${r.getString(0)} rank=${r.getDouble(1)}%.6f"))

    spark.stop()
  }
}
