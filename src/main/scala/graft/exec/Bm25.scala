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
  * with k1 = 1.2, b = 0.75. Every query LEAF scores — exact terms as
  * themselves, and (fts5-style prefix expansion) a prefix/wildcard leaf as
  * ONE query term whose per-doc tf is the sum over its matching dictionary
  * terms and whose df is its distinct matching-doc count. The reference
  * never asserts rank values (SURVEY §2 Q4), so the formula is ours to pin
  * down and oracle-test (`q4_bm25_rank` exact, `q4b_bm25_prefix_rank`
  * expanded).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** -> DataFrame(id, rank) for docs matching ≥1 query leaf. Docs in the
    * caller's id set that match no leaf keep rank 0 via the caller's left
    * join + coalesce (can't happen for pure-FTS queries anymore — every FTS
    * hit matches some leaf — but metadata-only compositions still rank 0).
    */
  def scores(postings: DataFrame, collStats: DataFrame, q: BoolQuery): DataFrame = {
    val leaves = BoolQuery.leaves(q).distinct
    val exact = leaves.collect { case BoolQuery.Term(t) => t }.distinct
    // each non-exact leaf gets a synthetic leaf key ("*0", "*1", …) — tokens
    // are \p{L}\p{N} runs, so no dictionary term can collide with it
    val expanded: Seq[(Column, String)] = leaves.zipWithIndex.collect {
      case (BoolQuery.Prefix(p), i) => (col("term").startsWith(p), s"*$i")
      case (w @ BoolQuery.Wildcard(p), i) =>
        val pre = p.takeWhile(_ != '*')
        val rx = col("term").rlike(w.regex)
        (if (pre.nonEmpty) col("term").startsWith(pre) && rx else rx, s"*$i")
    }
    if (exact.isEmpty && expanded.isEmpty)
      return postings.sparkSession.emptyDataFrame
        .select(lit("").as("id"), lit(0.0).as("rank")).limit(0)

    // one term-pruned scan for ALL exact terms (leaf key = the term itself),
    // plus one prefix/regex-pruned scan per expanded leaf (queries are small:
    // #scans = 1 + #wildcard leaves, each term-prunable)
    val base = postings.select(col("term"), col("id"), col("tf"), col("dl"))
    val exactScan =
      if (exact.isEmpty) Seq.empty
      else Seq(base.filter(col("term").isin(exact: _*))
        .select(col("term").as("leaf"), col("id"), col("tf"), col("dl")))
    val expandedScans = expanded.map { case (pred, key) =>
      base.filter(pred).select(lit(key).as("leaf"), col("id"), col("tf"), col("dl"))
    }
    val matched = (exactScan ++ expandedScans).reduce(_ union _)

    // per-(leaf, doc) tf — identity for exact leaves ((term, id) is unique),
    // the expansion sum for wildcard leaves; dl is constant per doc
    val perLeafDoc = matched.groupBy(col("leaf"), col("id"))
      .agg(sum(col("tf")).as("tf"), first(col("dl")).as("dl"))
    // df per leaf = distinct docs it matches; tiny (≤ #query leaves rows)
    val dfPerLeaf = perLeafDoc.groupBy(col("leaf")).agg(count(lit(1)).as("df"))
    val stats = collStats.select(col("n_docs"), col("avg_dl"))

    val idf: Column = log(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfPart: Column =
      (col("tf").cast("double") * lit(K1 + 1.0)) /
        (col("tf").cast("double") +
          lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avg_dl")))

    perLeafDoc
      .join(broadcast(dfPerLeaf), "leaf")
      .crossJoin(broadcast(stats))
      .select(col("id"), (idf * tfPart).as("__s"))
      .groupBy(col("id"))
      .agg(sum(col("__s")).as("rank"))
  }
}
