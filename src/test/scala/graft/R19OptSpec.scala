package graft

import graft.ext.{Ann, Graphs, Ivf, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-19 optimization-equivalence contracts: every change
  * rides a kill-switch conf, and each arm pair must produce IDENTICAL
  * results (the optimizations change plan shape, never values). Plan-shape
  * assertions use executedPlan.toString (AQE holds its inner plan as a
  * field — TreeNode.collect sees nothing, see the verify notes).
  */
class R19OptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic little vector corpus WITH exact duplicates (ids v0..),
    * so the (score desc, id asc) tie-break is actually exercised.
    */
  private def vecCorpus(n: Int): DataFrame =
    (0 until n).map { i =>
      val base = i % 7 // 7 distinct vectors -> heavy score ties
      (s"v$i", Seq.tabulate(8)(d => ((base + 1) * (d + 1)).toFloat / 10f))
    }.toDF("id", "embedding")
      .select($"id", $"embedding".cast("array<float>").as("embedding"))

  private val queries = Seq(
    "q0" -> Seq.tabulate(8)(d => (d + 1).toFloat / 10f),
    "q1" -> Seq.tabulate(8)(d => (8 - d).toFloat / 10f),
    "q2" -> Seq.tabulate(8)(_ => 0.5f))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def withConf[T](key: String, v: String)(f: => T): T = {
    spark.conf.set(key, v)
    try f finally spark.conf.unset(key)
  }

  test("exactTopK: batched arm equals per-query arm, incl. tie-breaks") {
    val corpus = vecCorpus(40)
    val newArm = Ann.exactTopK(corpus, queries, k = 5)
    val oldArm = withConf("spark.graft.ann.batchExact", "false")(
      Ann.exactTopK(corpus, queries, k = 5))
    assert(sortedRows(newArm) == sortedRows(oldArm))
    // shape: one-scan batched plan ranks via WindowGroupLimit; the old arm
    // is a union of per-query TakeOrderedAndProject scans
    assert(newArm.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val oldPlan = withConf("spark.graft.ann.batchExact", "false")(
      Ann.exactTopK(corpus, queries, k = 5).queryExecution.executedPlan.toString)
    assert(oldPlan.contains("TakeOrderedAndProject"))
  }

  test("adcTopK / adcTopKResidual: batched arm equals per-query arm") {
    val corpus = vecCorpus(40)
    val cb = Pq.train(corpus, m = 4, k = 8, iters = 3, maxSample = 100)
    val codes = Pq.encode(corpus, cb)
    val newArm = Pq.adcTopK(codes, cb, queries, k = 5)
    val oldArm = withConf("spark.graft.pq.batchAdc", "false")(
      Pq.adcTopK(codes, cb, queries, k = 5))
    assert(sortedRows(newArm) == sortedRows(oldArm))
    assert(newArm.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))

    val cents = Ivf.trainCentroids(corpus, k = 3, iters = 3, maxSample = 100)
    val rows = Ivf.assign(corpus, cents)
      .join(corpus, Seq("id"))
      .select($"id", $"cluster",
        Pq.encodeFor($"embedding", $"cluster", cents, cb, residual = true).as("codes"))
    val newRes = Pq.adcTopKResidual(rows, cb, cents, queries, k = 5)
    val oldRes = withConf("spark.graft.pq.batchAdc", "false")(
      Pq.adcTopKResidual(rows, cb, cents, queries, k = 5))
    assert(sortedRows(newRes) == sortedRows(oldRes))
  }

  test("pageRank: dangling-skip arm is bit-identical on a dangling-free graph") {
    // every node has out-edges (a ring plus chords) -> no dangling mass
    val edges = ((0 until 12).map(i => (s"n$i", s"n${(i + 1) % 12}")) ++
      (0 until 12 by 3).map(i => (s"n$i", s"n${(i + 5) % 12}")))
      .toDF("src", "dst")
    val skip = Graphs.pageRank(edges, iterations = 4).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val full = withConf("spark.graft.pagerank.skipDangling", "false")(
      Graphs.pageRank(edges, iterations = 4)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(skip.keySet == full.keySet)
    // BIT-identical, not approximately: with zero dangling mass the skipped
    // term is an exact `+ 0.0/n`
    skip.foreach { case (id, r) => assert(r == full(id), s"rank($id)") }
  }

  test("pageRank: a graph WITH dangling nodes still pays them exactly") {
    // n3 is dst-only (dangling): its mass must redistribute either way
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")).toDF("src", "dst")
    val auto = Graphs.pageRank(edges, iterations = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val full = withConf("spark.graft.pagerank.skipDangling", "false")(
      Graphs.pageRank(edges, iterations = 3)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(auto.keySet == full.keySet)
    auto.foreach { case (id, r) => assert(r == full(id), s"rank($id)") }
    // sanity: mass is conserved (the dangling completion's whole point)
    assert(math.abs(auto.values.sum - 1.0) < 1e-9)
  }

  test("ivfpq build: fused single-sample training equals the two-sample path") {
    import graft.api.Collection
    val corpus = vecCorpus(60).withColumn("content", lit(""))
    def build(fused: Boolean): (Seq[String], Seq[String], Seq[String]) = {
      val root = java.nio.file.Files.createTempDirectory("graft-r19opt-").toString
      val c = Collection(spark, root, "vecs", useFts = false)
      c.addDf(corpus)
      withConf("spark.graft.ivfpq.fusedSample", fused.toString)(
        c.createVectorIndex(kind = "ivfpq", numCentroids = 4, nprobe = 2,
          m = 4, candK = 10, iters = 3, maxSample = 100))
      val (cents, cb, rows, _, _) = c.ivfPqIndex().get
      (cents.map(_.toString), cb.books.map(_.toString),
        sortedRows(rows.select($"id", $"cluster", $"codes")))
    }
    val (cF, bF, rF) = build(fused = true)
    val (cU, bU, rU) = build(fused = false)
    assert(cF == cU, "coarse centroids must be bit-identical across arms")
    assert(bF == bU, "codebooks must be bit-identical across arms")
    assert(rF == rU, "(id, cluster, codes) rows must be identical across arms")
  }
}
