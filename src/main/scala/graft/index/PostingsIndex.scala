package graft.index

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builds the inverted index as plain DataFrames — the Spark-native analogue
  * of the reference's FTS5 virtual table (src/sifts/core.py:460-462) /
  * tsvector column (core.py:612-614).
  *
  * postings(term, id, tf, dl): `explode(tokens)` + `groupBy(id, term)`; one
  * shuffle keyed on (id, term), map-side combined. Written sorted by `term`
  * so parquet row-group min/max stats prune term lookups at query time (the
  * columnar stand-in for the inverted index's term btree).
  */
object PostingsIndex {

  /** docs(id, content, …) -> postings(term, id, tf, dl). `fold` = diacritic
    * folding (fts5 `unicode61 remove_diacritics` parity) — must match the
    * collection's query-side folding.
    */
  def build(docs: DataFrame, fold: Boolean = false): DataFrame = {
    val toks = docs
      .select(col("id"), TextFunctions.tokens(col("content"), fold).as("toks"))
      .select(col("id"), size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("term"))
    toks
      .groupBy(col("term"), col("id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .select("term", "id", "tf", "dl")
  }

}
