package graft.exec

import graft.model.BoolQuery
import graft.model.BoolQuery._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compiles a BoolQuery AST into a DataFrame of matching doc ids over the
  * postings index — the Spark-native replacement for `documents_fts MATCH ?`
  * (reference src/sifts/core.py:408-414) / `tsvector @@ to_tsquery`
  * (core.py:551-557).
  *
  * Plan shapes (all shuffle on `id`, prunable on `term`):
  *  - flat AND of k exact terms  -> one postings scan filtered
  *    `term IN (…)` + groupBy(id) having count(distinct term) = k.
  *  - flat OR of exact terms     -> one filtered scan + distinct ids.
  *  - anything nested / prefixes -> recursive join(AND, as semi) /
  *    union-distinct(OR). Prefix = range-prunable `startsWith` on the sorted
  *    `term` column (reference wildcard semantics, core.py:60).
  */
object FtsEval {

  /** -> single-column DataFrame `id` (distinct). */
  def matchingIds(postings: DataFrame, q: BoolQuery): DataFrame = {
    flatAndTerms(q) match {
      case Some(terms) if terms.size > 1 =>
        postings
          .filter(col("term").isin(terms: _*))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("__k")) // (term,id) unique => count == distinct terms
          .filter(col("__k") === lit(terms.size))
          .select("id")
      case _ =>
        flatOrTerms(q) match {
          case Some(terms) if terms.size > 1 =>
            postings.filter(col("term").isin(terms: _*)).select("id").distinct()
          case _ => eval(postings, q)
        }
    }
  }

  private def eval(postings: DataFrame, q: BoolQuery): DataFrame = q match {
    case Term(t)     => postings.filter(col("term") === t).select("id")
    case Prefix(p)   => postings.filter(col("term").startsWith(p)).select("id").distinct()
    // Mid-token wildcard: full term-dictionary scan by construction (no range
    // prune possible without literal prefix); when the pattern HAS a literal
    // prefix (te*m), startsWith narrows the scan before the regex runs.
    case w @ Wildcard(p) =>
      val pre = p.takeWhile(_ != '*')
      val base = if (pre.nonEmpty) postings.filter(col("term").startsWith(pre)) else postings
      base.filter(col("term").rlike(w.regex)).select("id").distinct()
    case And(l, r)   => matchingIds(postings, l).join(matchingIds(postings, r), "id")
    case Or(l, r)    => matchingIds(postings, l).union(matchingIds(postings, r)).distinct()
    // extended nodes carry a content-verification / anti-join obligation
    // the postings index alone cannot discharge — Collection lowers them
    case ext @ (_: Phrase | _: Near | _: Diff) =>
      throw new IllegalArgumentException(
        s"extended node $ext must be lowered by Collection before FtsEval")
  }

  /** Some(terms) iff q is exactly AND(Term, Term, …) with distinct terms. */
  private def flatAndTerms(q: BoolQuery): Option[Seq[String]] = q match {
    case Term(t) => Some(Seq(t))
    case And(l, r) =>
      for { a <- flatAndTerms(l); b <- flatAndTerms(r) } yield (a ++ b).distinct
    case _ => None
  }

  private def flatOrTerms(q: BoolQuery): Option[Seq[String]] = q match {
    case Term(t) => Some(Seq(t))
    case Or(l, r) =>
      for { a <- flatOrTerms(l); b <- flatOrTerms(r) } yield (a ++ b).distinct
    case _ => None
  }
}
