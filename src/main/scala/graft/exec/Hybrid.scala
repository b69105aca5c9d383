package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
  * independently-ranked retrieval arms — the standard hybrid-search
  * combinator for a collection that supports BOTH full-text BM25 and vector
  * cosine retrieval (the reference exposes the two arms separately,
  * src/sifts/core.py:414-447 vs 527-542, and leaves combining them to the
  * caller; RRF is the canonical score-free way to do it).
  *
  * Scale shape: each arm is first truncated to its top `depth` rows via
  * `orderBy(...).limit(depth)`, which Spark plans as TakeOrderedAndProject —
  * per-partition depth-heaps, driver merges depth·numPartitions rows — so the
  * corpus-sized ranked frames never fully sort and never fully shuffle.
  * Everything downstream of the truncation (the rank windows, the full-outer
  * join across arms, the final top-k) operates on ≤ arms·depth rows, a
  * constant independent of corpus size.
  */
object Hybrid {

  /** Fuse ranked arms into a top-k by RRF score.
    *
    * Each arm frame must carry (`id`, `rank`) with HIGHER rank better (BM25
    * score, cosine similarity — the collection's own ranked-query shape).
    * A document absent from an arm's top-`depth` contributes nothing for
    * that arm (the standard convention). Output: one row per fused document,
    * columns (`rn` 1-based fused rank, `id`, `rrf` fused score, plus one
    * `rn_<armName>` per arm — NULL when the doc is outside that arm's
    * depth), ordered (`rrf` DESC, `id` ASC), ≤ k rows.
    *
    * Determinism: within an arm, ties on `rank` break by `id` ASC; fused
    * ties on `rrf` break by `id` ASC.
    */
  def rrfFuse(arms: Seq[(String, DataFrame)], k: Int, depth: Int = 60,
              rrfK: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one ranked arm")
    require(k > 0 && depth > 0 && rrfK > 0, "k, depth, rrfK must be positive")
    val names = arms.map(_._1)
    require(names.distinct.size == names.size, s"duplicate arm names: $names")

    // Per arm: TakeOrderedAndProject truncation to `depth`, then a 1-based
    // rank over the ≤ depth survivors. The unpartitioned window is bounded
    // by construction (depth rows), so the single-partition sort it implies
    // is constant work, not a corpus-sized funnel.
    val rankedArms = arms.map { case (name, df) =>
      val top = df.select(col("id"), col("rank"))
        .orderBy(col("rank").desc, col("id").asc)
        .limit(depth)
      top.withColumn(s"rn_$name",
          row_number().over(Window.orderBy(col("rank").desc, col("id").asc)))
        .select(col("id"), col(s"rn_$name"))
    }

    val joined = rankedArms.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val rrfScore = names
      .map(n => coalesce(lit(1.0) / (lit(rrfK) + col(s"rn_$n")), lit(0.0)))
      .reduce(_ + _)

    joined.withColumn("rrf", rrfScore)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rrf").desc, col("id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select(Seq(col("rn"), col("id"), col("rrf")) ++
        names.map(n => col(s"rn_$n")): _*)
      .orderBy(col("rn"))
  }

  /** Linear score fusion — the score-aware alternative to [[rrfFuse]]:
    * each arm's top-`depth` scores min-max normalize to [0, 1] WITHIN the
    * truncated arm, and the fused score is the weighted sum (weights
    * default to 1). A document absent from an arm contributes 0 for it;
    * a constant-score arm normalizes to 1.0 for every survivor (its
    * depth-cut is still informative even when its scores are not).
    *
    * Same shapes and conventions as [[rrfFuse]]: (`id`, `rank`) arms with
    * higher better, TakeOrderedAndProject truncation, everything after the
    * cut bounded by arms·depth rows; output (`rn`, `id`, `score`, one
    * `s_<arm>` normalized column per arm), ties broken by `id` ASC.
    */
  def linearFuse(arms: Seq[(String, DataFrame)], k: Int, depth: Int = 60,
                 weights: Map[String, Double] = Map.empty): DataFrame = {
    require(arms.nonEmpty, "linearFuse needs at least one ranked arm")
    require(k > 0 && depth > 0, "k and depth must be positive")
    val names = arms.map(_._1)
    require(names.distinct.size == names.size, s"duplicate arm names: $names")
    require(weights.keySet.forall(names.contains), "weights must name existing arms")

    val normedArms = arms.map { case (name, df) =>
      val top = df.select(col("id"), col("rank"))
        .orderBy(col("rank").desc, col("id").asc)
        .limit(depth)
      // min/max window over the ≤ depth survivors: bounded single-partition
      // frame by construction, same rationale as rrfFuse's rank window
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      top
        .withColumn("__mn", min(col("rank")).over(w))
        .withColumn("__mx", max(col("rank")).over(w))
        .select(col("id"),
          when(col("__mx") > col("__mn"),
            (col("rank") - col("__mn")) / (col("__mx") - col("__mn")))
            .otherwise(lit(1.0)).as(s"s_$name"))
    }
    val joined = normedArms.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val fused = names
      .map(n => coalesce(col(s"s_$n"), lit(0.0)) * weights.getOrElse(n, 1.0))
      .reduce(_ + _)
    joined.withColumn("score", fused)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select(Seq(col("rn"), col("id"), col("score")) ++
        names.map(n => col(s"s_$n")): _*)
      .orderBy(col("rn"))
  }
}
