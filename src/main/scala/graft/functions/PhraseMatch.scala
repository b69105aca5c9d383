package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick automaton over a fixed phrase set, with the SAME match
  * semantics as the regex arm of `Web.blocklistTag`
  * (`lower(content) RLIKE \b(?:\Qp1\E|\Qp2\E|…)\b`): case-insensitive,
  * ASCII word boundaries at both phrase edges (`\b` = a `[A-Za-z0-9_]` /
  * non-word transition, the Java AND RE2 default — the two arms are
  * interchangeable and the spec diff-fuzzes them against each other).
  *
  * Why it exists: a regex alternation is compiled per pattern and scanned
  * with per-position alternative matching — practical to ~10k phrases. The
  * automaton is O(content chars) REGARDLESS of phrase count (UT1-scale
  * blocklists run to millions of entries), with memory O(total phrase
  * chars). Matches report per-position via output links; the scan
  * early-exits on the first boundary-valid hit.
  *
  * Build is eager (constructor); the [[MultiPhraseContains]] expression
  * holds it `@transient lazy`, so each executor builds it once per task
  * deserialization and only the phrase list rides the closure.
  */
final class PhraseAutomaton(phrases0: Seq[String]) extends Serializable {
  require(phrases0.nonEmpty, "phrase set must be non-empty")
  require(phrases0.forall(_.nonEmpty), "phrases must be non-empty strings")

  // Locale.ROOT: content is lowered by UTF8String.toLowerCase (locale-
  // independent); a default-locale lowercase here would mis-lower under
  // tr/az locales (dotless i) and silently match nothing
  private val phrases = phrases0.map(_.toLowerCase(java.util.Locale.ROOT))

  // trie: per-node char→child map; lens(v) = phrase lengths ending AT v
  private val children =
    scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
  private val lens = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
  for (p <- phrases) {
    var cur = 0
    for (c <- p) {
      val m = children(cur)
      var nxt = m.get(Character.valueOf(c))
      if (nxt == null) {
        children += new java.util.HashMap[Character, Integer]()
        lens += Nil
        nxt = Integer.valueOf(children.size - 1)
        m.put(Character.valueOf(c), nxt)
      }
      cur = nxt.intValue()
    }
    if (!lens(cur).contains(p.length)) lens(cur) = p.length :: lens(cur)
  }

  private val size = children.size
  private val fail = new Array[Int](size)
  // outputs(v) = every phrase length ending at v, DIRECT plus via the fail
  // chain (classic output-link flattening, so the scan never walks fails
  // to collect matches)
  private val outputs = new Array[Array[Int]](size)
  locally {
    outputs(0) = lens(0).toArray
    val queue = new java.util.ArrayDeque[Integer]()
    val it0 = children(0).entrySet.iterator
    while (it0.hasNext) {
      val e = it0.next()
      fail(e.getValue.intValue()) = 0
      queue.add(e.getValue)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outputs(u) = (lens(u) ++ outputs(fail(u)).toList).toArray
      val it = children(u).entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val v = e.getValue.intValue()
        var f = fail(u)
        var ff = -1
        while (ff < 0) {
          val nxt = children(f).get(c)
          if (nxt != null) ff = nxt.intValue()
          else if (f == 0) ff = 0
          else f = fail(f)
        }
        fail(v) = ff
        queue.add(Integer.valueOf(v))
      }
    }
  }

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** True iff any phrase occurs in `s` (already lowercased by the caller)
    * with `\b` semantics at both edges. Single forward scan, early exit.
    */
  def containsAny(s: String): Boolean = {
    val n = s.length
    var state = 0
    var i = 0
    while (i < n) {
      val c = Character.valueOf(s.charAt(i))
      var nxt = children(state).get(c)
      while (nxt == null && state != 0) {
        state = fail(state)
        nxt = children(state).get(c)
      }
      state = if (nxt == null) 0 else nxt.intValue()
      val outs = outputs(state)
      var k = 0
      while (k < outs.length) {
        val len = outs(k)
        val start = i - len + 1
        // \b at an edge: word-ness of the edge char XOR word-ness of the
        // char beyond it (out-of-range = non-word) — exactly Java/RE2 \b
        val leftOk = isWord(s.charAt(start)) !=
          (start > 0 && isWord(s.charAt(start - 1)))
        val rightOk = isWord(s.charAt(i)) !=
          (i + 1 < n && isWord(s.charAt(i + 1)))
        if (leftOk && rightOk) return true
        k += 1
      }
      i += 1
    }
    false
  }
}

object PhraseAutomaton {
  private val MaxCached = 8
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], PhraseAutomaton]()

  /** Executor-JVM-wide automaton cache: expression instances deserialize
    * per TASK, so without this a 100k-phrase automaton (~1.3M nodes) is
    * rebuilt 64× per stage — measured as the dominant cost of the 100k arm
    * in BENCH_scale_400x_r16c.json. Keyed by the phrase list itself (one
    * O(list) equality per task — negligible against the build); the
    * automaton is immutable after construction and safely published via
    * the CHM. Bounded crudely at [[MaxCached]] entries (clear-all beyond:
    * a session runs a handful of DISTINCT blocklists, not a churn of
    * them).
    */
  def cached(phrases: Seq[String]): PhraseAutomaton = {
    val got = cache.get(phrases)
    if (got != null) got
    else {
      if (cache.size >= MaxCached) cache.clear()
      // computeIfAbsent, not build-then-putIfAbsent: a stage launches all
      // its tasks at once, and 64 CONCURRENT 1.3M-node builds of the same
      // automaton are a GC storm (measured 4-5× the single build) — one
      // thread builds, the rest block on the mapping
      cache.computeIfAbsent(phrases, p => new PhraseAutomaton(p))
    }
  }
}

/** BOOLEAN phrase-set containment: true iff any of `phrases` occurs in the
  * (internally lowercased) string child at ASCII word boundaries. The
  * phrase list is a constructor parameter, not a child expression — it is
  * fixed at plan time, serialized once per task, and the automaton is
  * rebuilt lazily per executor. Null in → null out.
  */
case class MultiPhraseContains(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    phrases: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._

  override def dataType: DataType = BooleanType
  override def prettyName: String = "multi_phrase_contains"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires STRING, got ${other.catalogString}")
    }

  @transient private lazy val automaton = PhraseAutomaton.cached(phrases)

  override def nullSafeEval(input: Any): Any =
    automaton.containsAny(
      input.asInstanceOf[UTF8String].toLowerCase.toString)

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

object PhraseMatch {
  /** Column form of [[MultiPhraseContains]]. */
  def containsAnyPhrase(content: Column, phrases: Seq[String]): Column =
    Bridge.column(MultiPhraseContains(Bridge.expression(content), phrases))
}
