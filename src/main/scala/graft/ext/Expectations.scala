package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality contracts over a frame — the ingest-gate analogue of
  * dbt tests / Great Expectations, new-scope per BASELINE.json: a corpus
  * pipeline asserts its inputs (ids unique, required fields present,
  * values in range) and records violation MASS, not just pass/fail, so a
  * 0.01% breach can be waved through while a 40% one blocks the run.
  */
object Expectations {

  /** Evaluate row-wise SATISFACTION predicates in ONE scan: each rule is a
    * boolean Column, a row violates it when the predicate is false OR NULL
    * (strict — an unevaluable expectation is a failing one, the
    * convention that catches the null-ridden column you forgot about).
    * Output: one row per rule — (rule, n_rows, n_violations,
    * violation_rate, pass) with `pass = (n_violations == 0)`.
    *
    * Scale: a single map-side-combined aggregate over one pass of the
    * frame (all rules fold into one agg row, then unpivot driver-free);
    * no shuffle beyond the 1-row agg.
    */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    // coalesce the sum itself: over ZERO rows sum() is NULL, which would
    // make `pass` NULL instead of true and NPE a getBoolean caller — an
    // empty frame satisfies every row-wise contract (0 violations)
    val aggs = count(lit(1)).cast("long").as("__n") +: rules.map { case (name, pred) =>
      coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)), lit(0L))
        .as(s"__v_$name")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col("__n").as("n_rows"),
          col(s"__v_$name").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"),
        col("r.n_violations").as("n_violations"),
        when(col("r.n_rows") > 0,
          col("r.n_violations").cast("double") / col("r.n_rows"))
          .otherwise(lit(0.0)).as("violation_rate"),
        (col("r.n_violations") === 0).as("pass"))
  }

  /** Key-uniqueness contract: (n_rows, n_distinct, n_duplicates) over
    * `cols` — the one expectation that is not row-wise. NULL key tuples
    * count like any other value (two all-NULL keys are duplicates). One
    * count-distinct aggregate (partial-aggregated; swap in
    * `approx_count_distinct` upstream if an estimate suffices at 100 TB).
    */
  def duplicateKeys(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one key column")
    df.agg(count(lit(1)).cast("long").as("n_rows"),
        count_distinct(struct(cols.map(col): _*)).as("n_distinct"))
      .select(col("n_rows"), col("n_distinct"),
        (col("n_rows") - col("n_distinct")).as("n_duplicates"))
  }
}
