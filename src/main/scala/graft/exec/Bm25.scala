package graft.exec

import graft.model.BoolQuery
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance as pure column arithmetic over postings + stats — the
  * Spark-native analogue of FTS5's built-in `rank` (reference
  * src/sifts/core.py:410) / PG `ts_rank` (core.py:554). No UDAF: everything
  * stays inside whole-stage codegen.
  *
  * Formula (Lucene-style non-negative idf):
  *   idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )
  *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with k1 = 1.2, b = 0.75. Scoring uses the EXACT term leaves of the query
  * (prefix leaves don't contribute — the reference never asserts rank values,
  * SURVEY §2 Q4, so the formula is ours to pin down and oracle-test).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** -> DataFrame(id, rank) for docs matching ≥1 query term. Docs in `ids`
    * that match no exact term (prefix-only hits) get rank 0 via the caller's
    * left join + coalesce.
    */
  def scores(postings: DataFrame, collStats: DataFrame, q: BoolQuery): DataFrame = {
    val terms = BoolQuery.leaves(q).collect { case BoolQuery.Term(t) => t }.distinct
    if (terms.isEmpty) return postings.sparkSession.emptyDataFrame
      .select(lit("").as("id"), lit(0.0).as("rank")).limit(0)

    val matched = postings.filter(col("term").isin(terms: _*))
    // df per term from the same filtered scan; tiny (≤ #query terms rows).
    val dfPerTerm = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = collStats.select(col("n_docs"), col("avg_dl"))

    val idf: Column = log(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfPart: Column =
      (col("tf").cast("double") * lit(K1 + 1.0)) /
        (col("tf").cast("double") +
          lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avg_dl")))

    matched
      .join(broadcast(dfPerTerm), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), (idf * tfPart).as("__s"))
      .groupBy(col("id"))
      .agg(sum(col("__s")).as("rank"))
  }
}
