package graft.index

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builds the inverted index as plain DataFrames — the Spark-native analogue
  * of the reference's FTS5 virtual table (src/sifts/core.py:460-462) /
  * tsvector column (core.py:612-614).
  *
  * postings(term, id, tf, dl): per-row term-count map
  * ([[graft.functions.TermCounts]], one hash-map pass inside the row)
  * exploded to (term, tf) — a PURE SCAN with zero shuffle. The previous
  * `explode(tokens)` + `groupBy(id, term)` shape shuffled every token
  * OCCURRENCE of the batch (~7M rows per 100k docs) to compute what is a
  * per-row aggregate; at the 100 TB target that shuffle was the per-batch
  * ingest bottleneck — now ingest is embarrassingly parallel end to end.
  * Written sorted by `term` (sortWithinPartitions at the write site) so
  * parquet row-group min/max stats prune term lookups at query time (the
  * columnar stand-in for the inverted index's term btree).
  */
object PostingsIndex {

  /** docs(id, content, …) -> postings(term, id, tf, dl). `fold` = diacritic
    * folding (fts5 `unicode61 remove_diacritics` parity) — must match the
    * collection's query-side folding.
    */
  def build(docs: DataFrame, fold: Boolean = false): DataFrame = {
    val toks = TextFunctions.tokens(col("content"), fold)
    docs
      // one Project evaluates the tokenizer + counts ONCE per row; the
      // Generate above it consumes the materialized struct column
      // (CollapseProject does not cross Generate, so nothing re-evaluates)
      .select(col("id"), graft.functions.HashFunctions.termCounts(toks).as("s"))
      .select(col("id"), col("s.dl").as("dl"),
        explode(col("s.tc")).as(Seq("term", "tf")))
      .select("term", "id", "tf", "dl")
  }

}
