package graft

import graft.api.Collection
import graft.exec.Hybrid
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RRF hybrid-search fusion: exact score math, depth truncation, arm-absence
  * semantics, Collection.hybridTopK composition, and the TakeOrdered plan
  * shape of the arm truncation.
  */
class HybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def armA = Seq(("d1", 9.0), ("d2", 5.0), ("d3", 1.0)).toDF("id", "rank")
  private def armB = Seq(("d2", 0.9), ("d4", 0.8), ("d1", 0.2)).toDF("id", "rank")

  test("rrfFuse: exact 1/(K+rn) sums, per-arm ranks, fused order") {
    val out = Hybrid.rrfFuse(Seq("a" -> armA, "b" -> armB), k = 10, depth = 10, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // a-ranks: d1=1 d2=2 d3=3; b-ranks: d2=1 d4=2 d1=3
    val exp = Map(
      "d1" -> (1.0 / 61 + 1.0 / 63), "d2" -> (1.0 / 62 + 1.0 / 61),
      "d3" -> (1.0 / 63), "d4" -> (1.0 / 62))
    val ordered = exp.toSeq.sortBy { case (id, s) => (-s, id) }
    assert(out.toSeq === ordered.zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) })
  }

  test("rrfFuse: depth truncates an arm; a doc outside depth contributes nothing") {
    val out = Hybrid.rrfFuse(Seq("a" -> armA, "b" -> armB), k = 10, depth = 2, rrfK = 60)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    // d3 (a-rank 3) and d1's b-rank 3 fall outside depth=2
    assert(!out.contains("d3"))
    assert(out("d1") === 1.0 / 61)
    assert(out("d2") === 1.0 / 62 + 1.0 / 61)
  }

  test("rrfFuse: k bounds the fused output; absent-arm rank is NULL") {
    val rows = Hybrid.rrfFuse(Seq("a" -> armA, "b" -> armB), k = 1, depth = 10, rrfK = 60)
      .collect()
    assert(rows.length === 1)
    val top = rows.head
    assert(top.getString(1) === "d2") // 1/62+1/61 is the max fused score
    val d3 = Hybrid.rrfFuse(Seq("a" -> armA, "b" -> armB), k = 10, depth = 10, rrfK = 60)
      .filter(col("id") === "d3").collect().head
    assert(d3.getAs[Any]("rn_b") == null && d3.getAs[Int]("rn_a") === 3)
  }

  test("rrfFuse: fused ties break by id ascending") {
    val a = Seq(("x", 2.0), ("y", 1.0)).toDF("id", "rank")
    val b = Seq(("y", 2.0), ("x", 1.0)).toDF("id", "rank")
    val ids = Hybrid.rrfFuse(Seq("a" -> a, "b" -> b), k = 2, depth = 10, rrfK = 60)
      .collect().map(_.getString(1)).toSeq
    assert(ids === Seq("x", "y")) // equal 1/61+1/62 both; id tie-break
  }

  test("rrfFuse: validation rejects duplicate arm names and non-positive k") {
    intercept[IllegalArgumentException](
      Hybrid.rrfFuse(Seq("a" -> armA, "a" -> armB), k = 1))
    intercept[IllegalArgumentException](Hybrid.rrfFuse(Seq("a" -> armA), k = 0))
    intercept[IllegalArgumentException](Hybrid.rrfFuse(Seq.empty, k = 1))
  }

  test("rrfFuse: arm depth truncation plans as TakeOrderedAndProject (no full sort)") {
    val plan = Hybrid.rrfFuse(Seq("a" -> armA, "b" -> armB), k = 2, depth = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hybridTopK: equals manual fusion of the FTS frame and the cosine arm") {
    val root = java.nio.file.Files.createTempDirectory("graft-hybspec-").toString
    val c = Collection(spark, root, "h")
    c.addDf(Seq(
      ("a", "spark shuffles data across executors", Array(1.0f, 0.0f)),
      ("b", "spark broadcasts small tables", Array(0.9f, 0.1f)),
      ("c", "ducks swim in the pond", Array(0.0f, 1.0f)),
      ("d", "spark spark spark tuning guide", Array(0.5f, 0.5f))
    ).toDF("id", "content", "embedding"))
    val q = Seq(1.0f, 0.0f)
    val fused = c.hybridTopK("spark", q, k = 4, depth = 10, rrfK = 60)
    val manual = Hybrid.rrfFuse(Seq(
      "fts" -> c.queryFrame("spark").select("id", "rank"),
      "vec" -> graft.exec.VectorSearch.scored(c.docs(), "embedding", q)
        .select("id", "rank")), k = 4, depth = 10, rrfK = 60)
    assert(fused.collect().toSeq === manual.collect().toSeq)
    // "c" matches no FTS term but ranks in the vector arm: present, rn_fts NULL
    val cRow = fused.filter(col("id") === "c").collect().head
    assert(cRow.getAs[Any]("rn_fts") == null && cRow.getAs[Any]("rn_vec") != null)
  }

  test("hybridTopK: persisted-index vector arm equals the exact arm at full coverage; where keeps exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-hybspec3-").toString
    val c = Collection(spark, root, "h")
    c.addDf(Seq(
      ("a", "spark shuffles data across executors", Map("lang" -> "en"), Array(1.0f, 0.0f)),
      ("b", "spark broadcasts small tables", Map("lang" -> "de"), Array(0.9f, 0.1f)),
      ("c", "ducks swim in the pond", Map("lang" -> "en"), Array(0.0f, 1.0f)),
      ("d", "spark spark spark tuning guide", Map("lang" -> "en"), Array(0.5f, 0.5f))
    ).toDF("id", "content", "metadata", "embedding"))
    val q = Seq(1.0f, 0.0f)
    val exactFusion = c.hybridTopK("spark", q, k = 4, depth = 10).collect().toSeq
    // IVF at nprobe == numCentroids probes every list -> index arm == exact
    c.createVectorIndex(kind = "ivf", numCentroids = 2, nprobe = 2, iters = 3)
    assert(c.hybridTopK("spark", q, k = 4, depth = 10).collect().toSeq === exactFusion)
    // a metadata filter must keep the exact (pre-filtered) arm — the index
    // cannot filter before its depth cut
    val ids = c.hybridTopK("spark", q, k = 10, where = Map("lang" -> "en"))
      .collect().map(_.getString(1)).toSet
    assert(ids === Set("a", "c", "d"))
  }

  test("hybridTopK: where filters BOTH arms before ranking") {
    val root = java.nio.file.Files.createTempDirectory("graft-hybspec2-").toString
    val c = Collection(spark, root, "h")
    c.addDf(Seq(
      ("a", "spark rows here", Map("lang" -> "en"), Array(1.0f, 0.0f)),
      ("b", "spark rows there", Map("lang" -> "de"), Array(1.0f, 0.0f))
    ).toDF("id", "content", "metadata", "embedding"))
    val ids = c.hybridTopK("spark", Seq(1.0f, 0.0f), k = 10,
        where = Map("lang" -> "en"))
      .collect().map(_.getString(1)).toSet
    assert(ids === Set("a"))
  }

  test("hybrid FTS arm serves from the impact sidecar when certified, identically") {
    // zipf-ish corpus (the ImpactSpec shape): 'common' certifies at cap 64.
    // Both fusers and the federated searchAll must return BYTE-IDENTICAL
    // results whichever arm implementation ran — and the certified path
    // must actually be the one engaging (which-path assertions).
    val root = java.nio.file.Files.createTempDirectory("graft-hybimp-").toString
    val c = Collection(spark, root, "h")
    val docs = (1 to 400).map { i =>
      val body =
        if (i % 13 == 0) Seq.fill(50 + i % 7)("common").mkString(" ") + " rare"
        else "common"
      (f"d$i%05d", s"$body filler$i beta",
        Map("lang" -> (if (i % 3 == 0) "de" else "en")),
        Array(1.0f - i % 7 * 0.1f, i % 5 * 0.2f))
    }
    c.addDf(docs.toDF("id", "content", "metadata", "embedding"))
    val q = Seq(1.0f, 0.1f)
    val depth = 10
    val before = c.hybridTopK("common", q, k = 8, depth = depth).collect().toSeq
    val beforeLin = c.hybridTopKLinear("common", q, k = 8, depth = depth).collect().toSeq
    val beforeAll = Collection.searchAll(spark, root, "common", limit = 8)
      .collect().map(r => (r.getString(0), r.getDouble(3))).sortBy(_._1).toSeq
    c.createImpactIndex(cap = 64)
    // which-path: the arm's exact shape must certify at this depth
    assert(c.impactCertifiedTopK("common", depth, 0).nonEmpty,
      "the hybrid FTS arm must be served by the sidecar here")
    assert(c.hybridTopK("common", q, k = 8, depth = depth).collect().toSeq === before,
      "rrf fusion must not depend on which FTS arm ran")
    assert(c.hybridTopKLinear("common", q, k = 8, depth = depth).collect().toSeq === beforeLin,
      "linear fusion must not depend on which FTS arm ran")
    assert(Collection.searchAll(spark, root, "common", limit = 8)
      .collect().map(r => (r.getString(0), r.getDouble(3))).sortBy(_._1).toSeq === beforeAll,
      "federated search must not depend on which FTS arm ran")
    // a metadata where takes hybridFtsArm's FULL branch (the sidecar cannot
    // pre-filter) and must filter BOTH arms before ranking: every fused row
    // is an 'en' doc, and the de docs that ranked in the unfiltered fusion
    // are gone — a sidecar-served unfiltered arm would leak them through
    val en = c.hybridTopK("common", q, k = 8, depth = depth,
        where = Map("lang" -> "en")).collect().map(_.getString(1)).toSet
    assert(en.nonEmpty && en.forall(id => id.stripPrefix("d").toInt % 3 != 0),
      s"where must filter the FTS arm before its depth cut: $en")
    assert(en !== before.map(_.getString(1)).toSet)
  }

  test("linearFuse: min-max normalization, weights, absent-arm zero, constant arm") {
    import graft.exec.Hybrid
    val a = Seq(("x", 10.0), ("y", 5.0), ("z", 0.0)).toDF("id", "rank")
    val b = Seq(("x", 7.0), ("w", 7.0)).toDF("id", "rank") // constant scores
    val out = Hybrid.linearFuse(Seq("a" -> a, "b" -> b), k = 10,
        weights = Map("a" -> 1.0, "b" -> 0.5))
      .collect().map(r => r.getString(1) ->
        (r.getDouble(2), Option(r.get(3)), Option(r.get(4)))).toMap
    // x: a normalized 1.0, b constant arm -> 1.0; score = 1*1 + 0.5*1
    assert(out("x") === ((1.5, Some(1.0), Some(1.0))))
    // y: mid of a = 0.5, absent from b
    assert(out("y") === ((0.5, Some(0.5), None)))
    // z: min of a = 0.0 but still surfaced
    assert(out("z") === ((0.0, Some(0.0), None)))
    // w: only the constant arm
    assert(out("w") === ((0.5, None, Some(1.0))))
  }
}
