package graft

import graft.ext.{Ivf, LshIndex}
import graft.functions.VectorFunctions
import graft.plans.AnnCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cosine-top-k → ANN-candidate rewrite ([[graft.plans.AnnTopKRewrite]]):
  * fires only for registered corpus paths, preserves results on separated
  * clusters (full recall there), and honors the kill switch.
  */
class AnnRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two well-separated direction clusters in 8-d (axis e1 vs axis e5, ±ε
  // noise in one other coordinate) — any sane ANN probe has recall 1 here.
  private def mkCorpus(): (String, DataFrame) = {
    AnnCatalog.install(spark)
    val rows = (0 until 100).map { i =>
      val cluster = i % 2
      val v = Array.fill(8)(0.0f)
      v(cluster * 4) = 1.0f
      v(cluster * 4 + 1) = 0.01f * (i % 7)
      (f"v$i%03d", v.toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-annrw-").toString
    val path = s"$dir/corpus.parquet"
    rows.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(path)
    (path, spark.read.parquet(path))
  }

  private val q: Seq[Float] = {
    val v = Array.fill(8)(0.0f); v(0) = 1.0f; v(1) = 0.02f; v.toSeq
  }

  private def topK(corpus: DataFrame, k: Int): DataFrame =
    corpus
      .withColumn("sim", VectorFunctions.cosine(col("embedding"), VectorFunctions.vecLit(q)))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)

  private def hasSemiJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case j: Join => j.joinType == LeftSemi
      case _ => false
    }

  test("LSH registration rewrites to a semi join and keeps exact top-k results") {
    val (path, corpus) = mkCorpus()
    try {
      val exact = topK(corpus, 5).select("id").as[String].collect().toSeq
      assert(!hasSemiJoin(topK(corpus, 5)), "unregistered path must not rewrite")

      val index = LshIndex.build(corpus, numTables = 8, numPlanes = 2, dim = 8)
      AnnCatalog.register(spark, path,
        AnnCatalog.Entry("id", "embedding", AnnCatalog.LshRegistered(index)))

      val rewritten = topK(corpus, 5)
      assert(hasSemiJoin(rewritten), "registered path must rewrite to a semi join")
      // execute the SAME frame the semi join was asserted on — r9 found the
      // original `.select("id")` re-derivation dodged the (then-broken)
      // rewrite via column pruning, making this assertion vacuous
      assert(rewritten.collect().map(_.getString(0)).toSeq === exact,
        "separated clusters: candidate rerank must return the exact top-k")
      // the pruned select-on-top shape (Project between Limit and Sort)
      // must rewrite AND execute too
      val pruned = topK(corpus, 5).select("id")
      assert(hasSemiJoin(pruned), "pruned select-on-top shape must rewrite")
      assert(pruned.as[String].collect().toSeq === exact)
      // projection/schema untouched by the rewrite
      assert(rewritten.columns.toSeq === Seq("id", "embedding", "sim"))
    } finally AnnCatalog.clear()
  }

  test("IVF registration rewrites too; kill switch and idempotency hold") {
    val (path, corpus) = mkCorpus()
    try {
      val exact = topK(corpus, 5).select("id").as[String].collect().toSeq
      val ivf = Ivf.build(corpus, k = 4, iters = 5, maxSample = 1000)
      AnnCatalog.register(spark, path,
        AnnCatalog.Entry("id", "embedding", AnnCatalog.IvfRegistered(ivf, nprobe = 1)))

      val rewritten = topK(corpus, 5)
      assert(hasSemiJoin(rewritten))
      assert(rewritten.collect().map(_.getString(0)).toSeq === exact)
      // exactly ONE semi join even though optimizer batches run to fixed point
      val semis = rewritten.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftSemi => j
      }
      assert(semis.size === 1, "rewrite must be idempotent across rule iterations")

      spark.conf.set("spark.graft.ann.rewrite", "false")
      try assert(!hasSemiJoin(topK(corpus, 5)), "kill switch must disable the rewrite")
      finally spark.conf.set("spark.graft.ann.rewrite", "true")
    } finally AnnCatalog.clear()
  }

  test("metadata-filtered cosine top-k rewrites to the semi join (X115 through F2)") {
    // WHERE meta_pred ... ORDER BY cosine DESC LIMIT k — the filtered
    // serving shape (r13 punch #6). The optimizer pushes the Filter below
    // the Sort, so the candidate semi join lands on the FILTERED corpus:
    // X115's intersect-then-rerank contract, with bucket-complete
    // candidates (better recall than a k×overfetch cut).
    AnnCatalog.install(spark)
    val rows = (0 until 100).map { i =>
      val v = Array.fill(8)(0.0f)
      v((i % 2) * 4) = 1.0f
      v((i % 2) * 4 + 1) = 0.01f * (i % 7)
      (f"v$i%03d", v.toSeq, if (i % 3 == 0) "a" else "b")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-annrwf-").toString
    val path = s"$dir/corpus.parquet"
    rows.toDF("id", "embedding", "grp")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(path)
    val corpus = spark.read.parquet(path)
    try {
      def filteredTopK(k: Int): DataFrame =
        corpus.filter(col("grp") === "a")
          .withColumn("sim", VectorFunctions.cosine(col("embedding"), VectorFunctions.vecLit(q)))
          .orderBy(col("sim").desc, col("id").asc)
          .limit(k)
      val exact = filteredTopK(5).select("id").as[String].collect().toSeq
      assert(exact.size === 5 && !hasSemiJoin(filteredTopK(5)))

      val index = LshIndex.build(corpus, numTables = 8, numPlanes = 2, dim = 8)
      AnnCatalog.register(spark, path,
        AnnCatalog.Entry("id", "embedding", AnnCatalog.LshRegistered(index)))

      val rewritten = filteredTopK(5)
      assert(hasSemiJoin(rewritten), "filtered top-k must serve from the index")
      assert(rewritten.collect().map(_.getString(0)).toSeq === exact,
        "filter ∩ candidates rerank must equal the exact filtered top-k")
      // the filter must still reach the scan side (below the semi join),
      // not run post-rerank — post-rerank filtering would under-fill k
      val planStr = rewritten.queryExecution.executedPlan.toString
      assert(planStr.contains("LeftSemi"))

      // the same shape through SQL (the pgvector-user surface)
      corpus.createOrReplaceTempView("annf_corpus")
      graft.plans.GraftFunctions.register(spark)
      val lit = q.map(v => f"${v}%.2fF").mkString("array(", ", ", ")")
      val viaSql = spark.sql(
        s"""SELECT id, graft_cosine(embedding, cast($lit as array<float>)) AS sim
           |FROM annf_corpus WHERE grp = 'a'
           |ORDER BY sim DESC, id ASC LIMIT 5""".stripMargin)
      assert(hasSemiJoin(viaSql), "SQL filtered top-k must rewrite too")
      assert(viaSql.select("id").as[String].collect().toSeq === exact)
    } finally AnnCatalog.clear()
  }

  test("Collection.createVectorIndex arms the rewrite for its docs store") {
    import graft.api.{Collection, Embedder}
    AnnCatalog.install(spark)
    object AxisEmbedder extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
        val v = Array.fill(8)(0.0f)
        v(if (t.contains("cat")) 0 else 4) = 1.0f
        v(1) = 0.001f * (t.length % 9)
        v
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-annrw-coll-").toString
    val c = Collection(spark, root, "rw", Some(AxisEmbedder))
    try {
      c.add((1 to 40).map(i => if (i % 2 == 0) s"cat doc $i" else s"dog doc $i"))
      val plain = topK(c.docs(), 5)
      assert(!hasSemiJoin(plain), "no index yet -> exact plan untouched")
      val exact = plain.select("id").as[String].collect().toSeq

      c.createVectorIndex(numTables = 8, numPlanes = 2, dim = 8)
      val accel = topK(c.docs(), 5)
      assert(hasSemiJoin(accel), "persisted collection index must arm the rewrite")
      assert(accel.select("id").as[String].collect().toSeq === exact)

      // deferred resolution: dropping the store makes the rewrite DECLINE
      // (back to the exact plan), not serve stale buckets
      c.deleteAll()
      c.add(Seq("cat doc after reset"))
      assert(!hasSemiJoin(topK(c.docs(), 5)))
    } finally AnnCatalog.clear()
  }

  test("SQL metadata filter over an armed docs store matches vectorTopKWhere") {
    import graft.api.{Collection, Embedder}
    AnnCatalog.install(spark)
    object AxisEmbedder extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
        val v = Array.fill(8)(0.0f)
        v(if (t.contains("cat")) 0 else 4) = 1.0f
        v(1) = 0.001f * (t.length % 9)
        v
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-annrw-fw-").toString
    val c = Collection(spark, root, "rwf", Some(AxisEmbedder))
    try {
      c.addDf((1 to 60).map(i =>
          (f"d$i%03d", if (i % 2 == 0) s"cat doc $i" else s"dog doc $i",
            Map("grp" -> (if (i % 3 == 0) "a" else "b"))))
        .toDF("id", "content", "metadata"))
      c.createVectorIndex(numTables = 8, numPlanes = 2, dim = 8)
      // the filtered serving shape on the MAP metadata column, through the
      // armed docs-store scan
      val filtered = c.docs().filter(element_at(col("metadata"), "grp") === "a")
        .withColumn("sim", VectorFunctions.cosine(col("embedding"), VectorFunctions.vecLit(q)))
        .orderBy(col("sim").desc, col("id").asc).limit(5)
      assert(hasSemiJoin(filtered),
        "metadata-filtered top-k over an armed store must serve from the index")
      val got = filtered.select("id").as[String].collect().toSeq
      // ≡ the X115 API's answer for the same (query, k, where)
      val x115 = c.vectorTopKWhere(Seq(("q", q)), 5, Map("grp" -> "a"))
        .orderBy(col("rn")).select("id").as[String].collect().toSeq
      assert(got === x115, "F2 filtered plan and vectorTopKWhere must agree")
    } finally AnnCatalog.clear()
  }

  test("Collection IVF index (kind=ivf) arms the rewrite; delta upsert stays current") {
    import graft.api.{Collection, Embedder}
    AnnCatalog.install(spark)
    object AxisEmbedder extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
        val v = Array.fill(8)(0.0f)
        v(if (t.contains("cat")) 0 else 4) = 1.0f
        v(1) = 0.001f * (t.length % 9)
        v
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-annrw-ivf-").toString
    val c = Collection(spark, root, "rwivf", Some(AxisEmbedder))
    try {
      c.add((1 to 40).map(i => if (i % 2 == 0) s"cat doc $i" else s"dog doc $i"))
      val exact = topK(c.docs(), 5).select("id").as[String].collect().toSeq
      c.createVectorIndex(kind = "ivf", numCentroids = 2, iters = 4, nprobe = 1)
      val accel = topK(c.docs(), 5)
      assert(hasSemiJoin(accel), "collection IVF index must arm the rewrite")
      // two well-separated directions, nprobe=1 probes the query's home
      // cluster — which holds all true neighbors, so results stay exact
      assert(accel.select("id").as[String].collect().toSeq === exact)
      // deferred resolution reads the CURRENT store: a delta-maintained
      // upsert's new doc is probeable through the rewrite without rebuild,
      // and results still match the exact plan (kill switch = baseline)
      c.add(Seq("cat doc fresh zz"))
      val after = topK(c.docs(), 3)
      assert(hasSemiJoin(after))
      spark.conf.set("spark.graft.ann.rewrite", "false")
      val baseline = topK(c.docs(), 3).select("id").as[String].collect().toSeq
      spark.conf.unset("spark.graft.ann.rewrite")
      assert(after.select("id").as[String].collect().toSeq === baseline)
      c.deleteAll()
      c.add(Seq("cat doc after reset"))
      assert(!hasSemiJoin(topK(c.docs(), 5)))
    } finally AnnCatalog.clear()
  }

  test("Collection PQ index (kind=pq) arms the rewrite; delta upsert stays current") {
    import graft.api.{Collection, Embedder}
    AnnCatalog.install(spark)
    object AxisEmbedder extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
        val v = Array.fill(8)(0.0f)
        v(if (t.contains("cat")) 0 else 4) = 1.0f
        v(1) = 0.001f * (t.length % 9)
        v
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-annrw-pq-").toString
    val c = Collection(spark, root, "rwpq", Some(AxisEmbedder))
    try {
      c.add((1 to 40).map(i => if (i % 2 == 0) s"cat doc $i" else s"dog doc $i"))
      val exact = topK(c.docs(), 5).select("id").as[String].collect().toSeq
      // candK covers the whole corpus, so the ADC candidate cut drops
      // nothing and the surrounding exact rerank reproduces the exact plan
      c.createVectorIndex(kind = "pq", m = 4, numCentroids = 16, iters = 4,
        candK = 50)
      val accel = topK(c.docs(), 5)
      assert(hasSemiJoin(accel), "collection PQ index must arm the rewrite")
      assert(accel.select("id").as[String].collect().toSeq === exact)
      // deferred resolution reads the CURRENT store: a delta-maintained
      // upsert's new doc is probeable through the rewrite without rebuild
      c.add(Seq("cat doc fresh zz"))
      val after = topK(c.docs(), 3)
      assert(hasSemiJoin(after))
      spark.conf.set("spark.graft.ann.rewrite", "false")
      val baseline = topK(c.docs(), 3).select("id").as[String].collect().toSeq
      spark.conf.unset("spark.graft.ann.rewrite")
      assert(after.select("id").as[String].collect().toSeq === baseline)
      // vectorTopK serves from the PQ store too (retrieve+rerank shape)
      val qv = AxisEmbedder.embed(Seq("cat probe")).head.toSeq
      assert(c.vectorTopK(Seq("q" -> qv), 3).count() === 3)
      c.deleteAll()
      c.add(Seq("cat doc after reset"))
      assert(!hasSemiJoin(topK(c.docs(), 5)))
    } finally AnnCatalog.clear()
  }

  test("Collection IVF-PQ index (kind=ivfpq) arms the rewrite; probes stay exact at full coverage") {
    import graft.api.{Collection, Embedder}
    AnnCatalog.install(spark)
    object AxisEmbedder extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
        val v = Array.fill(8)(0.0f)
        v(if (t.contains("cat")) 0 else 4) = 1.0f
        v(1) = 0.001f * (t.length % 9)
        v
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-annrw-ivfpq-").toString
    val c = Collection(spark, root, "rwivfpq", Some(AxisEmbedder))
    try {
      c.add((1 to 40).map(i => if (i % 2 == 0) s"cat doc $i" else s"dog doc $i"))
      val exact = topK(c.docs(), 5).select("id").as[String].collect().toSeq
      // nprobe covers both lists and candK the corpus -> rewrite == exact
      c.createVectorIndex(kind = "ivfpq", numCentroids = 2, nprobe = 2,
        m = 4, candK = 50, iters = 4)
      val accel = topK(c.docs(), 5)
      assert(hasSemiJoin(accel), "collection IVF-PQ index must arm the rewrite")
      assert(accel.select("id").as[String].collect().toSeq === exact)
      c.deleteAll()
      c.add(Seq("cat doc after reset"))
      assert(!hasSemiJoin(topK(c.docs(), 5)))
    } finally AnnCatalog.clear()
  }

  test("rewrite binds the REGISTERED relation's columns through joins") {
    val (path, corpus) = mkCorpus()
    try {
      val index = LshIndex.build(corpus, numTables = 8, numPlanes = 2, dim = 8)
      AnnCatalog.register(spark, path,
        AnnCatalog.Entry("id", "embedding", AnnCatalog.LshRegistered(index)))
      // LEFT side exposes its own `id` column with DIFFERENT values — binding
      // by bare name would pick this one and semi-join on garbage
      val side = (0 until 100).map(i => (f"v$i%03d", s"SIDE$i"))
        .toDF("join_key", "id")
      val joined = side.join(corpus, side("join_key") === corpus("id"))
      val q5 = joined
        .withColumn("sim", VectorFunctions.cosine(corpus("embedding"), VectorFunctions.vecLit(q)))
        .orderBy(col("sim").desc, corpus("id").asc).limit(5)
      assert(hasSemiJoin(q5), "must still fire with a join in the child")
      val exact = topK(corpus, 5).select("id").as[String].collect().toSeq
      assert(q5.select(corpus("id")).as[String].collect().toSeq === exact,
        "must filter on the registered store's ids, not the side frame's")
      // cosine over a DIFFERENT frame's embedding column (same name, other
      // exprId) must NOT rewrite
      val side2 = (0 until 100).map(i => (f"v$i%03d", Seq.fill(8)(0.5f)))
        .toDF("join_key", "embedding")
      val joined2 = side2.join(corpus.drop("embedding"), side2("join_key") === corpus("id"))
      val other = joined2
        .withColumn("sim", VectorFunctions.cosine(side2("embedding"), VectorFunctions.vecLit(q)))
        .orderBy(col("sim").desc).limit(5)
      assert(!hasSemiJoin(other),
        "a same-named embedding from another relation must decline")
    } finally AnnCatalog.clear()
  }

  test("deleteAll retires the registration (catalog emptied with the store)") {
    import graft.api.{Collection, Embedder}
    AnnCatalog.install(spark)
    object E extends Embedder {
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        texts.map { t => val v = Array.fill(8)(0.0f); v(t.length % 8) = 1.0f; v }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-annrw-unreg-").toString
    val c = Collection(spark, root, "unreg", Some(E))
    try {
      c.add((1 to 20).map(i => s"doc $i"))
      c.createVectorIndex(numTables = 4, numPlanes = 2, dim = 8)
      assert(!AnnCatalog.isEmpty, "createVectorIndex must register")
      c.deleteAll()
      assert(AnnCatalog.isEmpty,
        "deleteAll must unregister — a retained entry keeps every query paying rule cost")
    } finally AnnCatalog.clear()
  }

  test("two registered corpora joined: binds the one the sort key scores") {
    val (pathA, corpusA) = mkCorpus()
    // second corpus: same ids, orthogonal embeddings (axis e2/e6)
    val rowsB = (0 until 100).map { i =>
      val v = Array.fill(8)(0.0f)
      v((i % 2) * 4 + 2) = 1.0f
      v(3) = 0.01f * (i % 5)
      (f"v$i%03d", v.toSeq)
    }
    val dirB = java.nio.file.Files.createTempDirectory("graft-annrw-b-").toString
    val pathB = s"$dirB/corpus.parquet"
    rowsB.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(pathB)
    val corpusB = spark.read.parquet(pathB)
    try {
      AnnCatalog.register(spark, pathA, AnnCatalog.Entry("id", "embedding",
        AnnCatalog.LshRegistered(LshIndex.build(corpusA, numTables = 8, numPlanes = 2, dim = 8))))
      AnnCatalog.register(spark, pathB, AnnCatalog.Entry("id", "embedding",
        AnnCatalog.LshRegistered(LshIndex.build(corpusB, numTables = 8, numPlanes = 2, dim = 8))))
      val qB: Seq[Float] = { val v = Array.fill(8)(0.0f); v(2) = 1.0f; v(3) = 0.02f; v.toSeq }
      val exactB = corpusB
        .withColumn("sim", VectorFunctions.cosine(col("embedding"), VectorFunctions.vecLit(qB)))
        .orderBy(col("sim").desc, col("id").asc).limit(5)
        .select("id").as[String].collect().toSeq
      // join both registered corpora (non-USING join: B's own id column must
      // survive into the child output for the exprId guard); score corpus B's
      // embedding — the rule must select B's registration (A appears first
      // in plan order)
      val joined = corpusA.select(col("id").as("id_a"), col("embedding").as("emb_a"))
        .join(corpusB, col("id_a") === corpusB("id"))
      val top = joined
        .withColumn("sim", VectorFunctions.cosine(corpusB("embedding"), VectorFunctions.vecLit(qB)))
        .orderBy(col("sim").desc, corpusB("id").asc).limit(5)
      assert(hasSemiJoin(top), "must fire on the SECOND registered relation in plan order")
      assert(top.select(corpusB("id")).as[String].collect().toSeq === exactB)
    } finally AnnCatalog.clear()
  }

  test("non-cosine sorts and other columns never rewrite") {
    val (path, corpus) = mkCorpus()
    try {
      val index = LshIndex.build(corpus, numTables = 8, numPlanes = 2, dim = 8)
      AnnCatalog.register(spark, path,
        AnnCatalog.Entry("id", "other_col", AnnCatalog.LshRegistered(index)))
      // registered for a DIFFERENT embedding column name -> no rewrite
      assert(!hasSemiJoin(topK(corpus, 5)))
      // plain sort on id -> no rewrite
      assert(!hasSemiJoin(corpus.orderBy(col("id").desc).limit(5)))
    } finally AnnCatalog.clear()
  }
}
