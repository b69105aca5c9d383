package graft.exec

import graft.model.{WhereOp, WhereVal}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `where` metadata predicates -> Catalyst Columns over the
  * MAP<STRING,STRING> metadata column.
  *
  * Reproduces the reference's dynamic typing (src/sifts/core.py:272-287):
  * numeric OPERAND -> cast the extracted value to double and compare
  * numerically (the analogue of `(metadata->>'k')::double precision`,
  * core.py:572); string operand -> plain string compare. `$in`/`$nin`
  * operands are pre-stringified (core.py:242, 251) and `$nin` inherits SQL
  * NULL semantics: a doc without the key yields NULL -> filtered out
  * (pinned by reference test_sqlite.py:310-316) — Spark's `isin` on a null
  * column behaves identically, so no special-casing.
  *
  * Everything is a plain comparison on a map lookup: Catalyst folds the
  * chained filters into one predicate inside whole-stage codegen.
  */
object MetaFilter {

  def column(metadata: Column, key: String, op: WhereOp): Column = {
    val v: Column = metadata.getItem(key)
    // try_cast, not cast: metadata is schemaless, and under Spark 4's
    // default ANSI mode a plain cast CRASHES the whole query on the first
    // non-numeric value ("N/A" > 100 -> SparkNumberFormatException). A
    // non-numeric value try_casts to NULL -> comparison NULL -> doc
    // filtered, the documented semantics. (The reference's backends diverge
    // here anyway: PG's ::double precision errors, SQLite's type-rank
    // ordering compares; non-matching is the sane engine behavior.)
    def num: Column = v.try_cast("double")
    op match {
      case WhereOp.Eq(WhereVal.Str(s))  => v === s
      case WhereOp.Eq(WhereVal.Num(n))  => num === n
      case WhereOp.Gt(WhereVal.Str(s))  => v > s
      case WhereOp.Gt(WhereVal.Num(n))  => num > n
      case WhereOp.Lt(WhereVal.Str(s))  => v < s
      case WhereOp.Lt(WhereVal.Num(n))  => num < n
      case WhereOp.Gte(WhereVal.Str(s)) => v >= s
      case WhereOp.Gte(WhereVal.Num(n)) => num >= n
      case WhereOp.Lte(WhereVal.Str(s)) => v <= s
      case WhereOp.Lte(WhereVal.Num(n)) => num <= n
      case WhereOp.In(vs)               => v.isin(vs: _*)
      case WhereOp.Nin(vs)              => !v.isin(vs: _*)
    }
  }

  /** All clauses AND-ed (reference appends each with " AND ", core.py:226-300). */
  def combined(metadata: Column, where: Seq[(String, WhereOp)]): Option[Column] =
    where.map { case (k, op) => column(metadata, k, op) }.reduceOption(_ && _)
}
