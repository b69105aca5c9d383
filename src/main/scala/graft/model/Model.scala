package graft.model

/** Core data model for the graft search engine.
  *
  * Mirrors the reference's two abstractions (reference: src/sifts/core.py:70-110 —
  * Collection namespace + 5-attribute Document) re-expressed as Spark-friendly
  * case classes with Catalyst `Encoder`s.
  */

/** A document row. `metadata` is schemaless string->string (the reference stores
  * JSON, src/sifts/core.py:151-154); numeric comparisons are done at query time by
  * casting, reproducing the reference's dynamic typing (core.py:272-287).
  */
final case class Doc(
    id: String,
    collection: String,
    content: String,
    metadata: Map[String, String],
    embedding: Array[Float]
)

/** One search result. `rank` is present only for FTS / vector queries
  * (reference: src/sifts/core.py:346-358 — 5-column vs 4-column rows).
  */
final case class SearchHit(
    id: String,
    content: String,
    metadata: Map[String, String],
    rank: Option[Double]
)

/** `{total, results}` — total is the PRE-limit match count
  * (reference: src/sifts/core.py:22-24, 341-344).
  */
final case class QueryResult(total: Long, results: Seq[SearchHit])

// ---------------------------------------------------------------------------
// Boolean full-text query AST (produced by graft.parse.QueryParser).
// Grammar of the reference (src/sifts/core.py:27-67): bare words,
// case-insensitive and/or, trailing-* prefix, implicit AND, AND > OR.
// ---------------------------------------------------------------------------
sealed trait BoolQuery extends Product with Serializable
object BoolQuery {
  final case class Term(t: String) extends BoolQuery
  final case class Prefix(p: String) extends BoolQuery

  /** `*` anywhere in the term (SQLite FTS5 parity — PG documents trailing-only,
    * reference README.md:69; core.py:60 rewrites only the trailing form).
    * `pattern` keeps the literal `*`s; [[regex]] is the anchored Java-regex
    * equivalent evaluated with `rlike` over the postings `term` column.
    */
  final case class Wildcard(pattern: String) extends BoolQuery {
    lazy val regex: String =
      pattern.split("\\*", -1).map {
        case "" => ""
        case lit => java.util.regex.Pattern.quote(lit)
      }.mkString("^", ".*", "$")
  }
  final case class And(l: BoolQuery, r: BoolQuery) extends BoolQuery
  final case class Or(l: BoolQuery, r: BoolQuery) extends BoolQuery

  /** EXTENDED leaves — graft-only syntax from
    * [[graft.parse.QueryParser.parseExtended]] (`"quoted phrase"`,
    * `near(a b, k)`), NOT part of the reference grammar. They carry a
    * content-verification obligation beyond the postings index, so
    * `Collection` lowers them (postings AND-gate + candidates-only verify)
    * before anything reaches [[graft.exec.FtsEval]] / `Bm25`, which reject
    * them defensively.
    */
  final case class Phrase(terms: Seq[String]) extends BoolQuery
  final case class Near(terms: Seq[String], k: Int) extends BoolQuery

  /** `l NOT r` — matches of `l` minus matches of `r` (the fts5 binary NOT,
    * graft-only extended syntax like [[Phrase]]/[[Near]]). The right side
    * is an exclusion gate only: it never contributes BM25 scoring terms,
    * and `Collection` lowers it to a LEFT ANTI join on the match-id
    * frames before anything reaches FtsEval/Bm25.
    */
  final case class Diff(l: BoolQuery, r: BoolQuery) extends BoolQuery

  /** True iff the tree contains an extended (verify-carrying or
    * anti-join-carrying) node. */
  def hasExtended(q: BoolQuery): Boolean = q match {
    case And(l, r) => hasExtended(l) || hasExtended(r)
    case Or(l, r)  => hasExtended(l) || hasExtended(r)
    case _: Phrase | _: Near | _: Diff => true
    case _ => false
  }

  /** All leaf terms/prefixes, left-to-right (used for BM25 scoring terms).
    * A [[Diff]]'s right side is excluded docs, not scoring signal — only
    * the kept side contributes. */
  def leaves(q: BoolQuery): Seq[BoolQuery] = q match {
    case And(l, r)  => leaves(l) ++ leaves(r)
    case Or(l, r)   => leaves(l) ++ leaves(r)
    case Diff(l, _) => leaves(l)
    case leaf       => Seq(leaf)
  }
}

// ---------------------------------------------------------------------------
// Metadata `where` predicates. Operand typing is decided by the OPERAND's
// runtime type, exactly like the reference (core.py:272-287): numeric operand
// -> numeric (cast) compare; anything else -> string compare. `$in`/`$nin`
// operands are always stringified (core.py:242, 251).
// ---------------------------------------------------------------------------
sealed trait WhereVal extends Product with Serializable
object WhereVal {
  final case class Num(v: Double) extends WhereVal
  final case class Str(v: String) extends WhereVal
  def apply(v: Any): WhereVal = v match {
    case n: Int    => Num(n.toDouble)
    case n: Long   => Num(n.toDouble)
    case n: Float  => Num(n.toDouble)
    case n: Double => Num(n)
    case other     => Str(String.valueOf(other))
  }
}

sealed trait WhereOp extends Product with Serializable
object WhereOp {
  final case class Eq(v: WhereVal) extends WhereOp
  final case class Gt(v: WhereVal) extends WhereOp
  final case class Lt(v: WhereVal) extends WhereOp
  final case class Gte(v: WhereVal) extends WhereOp
  final case class Lte(v: WhereVal) extends WhereOp
  /** values are stringified, reference core.py:242 */
  final case class In(vs: Seq[String]) extends WhereOp
  /** NULL semantics: docs without the key are excluded too (core.py:241-261,
    * pinned by test_sqlite.py:310-316). Spark's `isin` on null matches this. */
  final case class Nin(vs: Seq[String]) extends WhereOp

  /** Parse the reference's `{"$gt": v}`-style op maps. Unknown `$op` raises,
    * matching core.py:231-240. */
  def fromMap(m: Map[String, Any]): Seq[WhereOp] = m.toSeq.map {
    case ("$eq", v)  => Eq(WhereVal(v))
    case ("$gt", v)  => Gt(WhereVal(v))
    case ("$lt", v)  => Lt(WhereVal(v))
    case ("$gte", v) => Gte(WhereVal(v))
    case ("$lte", v) => Lte(WhereVal(v))
    case ("$in", v: Seq[_])  => In(v.map(String.valueOf(_)))
    case ("$nin", v: Seq[_]) => Nin(v.map(String.valueOf(_)))
    case (op, _) =>
      throw new IllegalArgumentException(
        s"Invalid operator $op. Valid operators are $$eq, $$gt, $$lt, $$gte, $$lte, $$in, $$nin.")
  }
}

/** `order_by` argument: a bare field string or a list of fields, like the
  * reference's `str | list[str]` union (core.py:306-311). The implicit
  * conversions make both `orderBy = "-k"` and `orderBy = Seq("-k", "k2")`
  * typecheck at the `Collection` API.
  */
final case class OrderBy(keys: Seq[String]) extends AnyVal
object OrderBy {
  val none: OrderBy = OrderBy(Nil)
  import scala.language.implicitConversions
  implicit def fromString(s: String): OrderBy = OrderBy(Seq(s))
  implicit def fromSeq(keys: Seq[String]): OrderBy = OrderBy(keys)
}

/** One sort key from `order_by`: leading '-' = DESC, optional '+' = ASC
  * (reference core.py:306-311). DESC => NULLS FIRST, ASC => NULLS LAST
  * (core.py:312-315) — note this is the OPPOSITE of Spark's defaults in both
  * directions, so the exec layer must be explicit.
  */
final case class SortKey(field: String, descending: Boolean)
object SortKey {
  def parse(raw: String): SortKey =
    if (raw.startsWith("-")) SortKey(raw.substring(1), descending = true)
    else if (raw.startsWith("+")) SortKey(raw.substring(1), descending = false)
    else SortKey(raw, descending = false)
}
