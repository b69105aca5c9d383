package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Diacritic folding: NFD-decompose, drop combining marks that follow a
  * LATIN base character (the fts5 `unicode61 remove_diacritics` behavior,
  * reference src/sifts/core.py:461): 'café' -> 'cafe', 'Müller' ->
  * 'Muller'. Marks on non-Latin bases are PRESERVED — in Thai, Devanagari,
  * Arabic, or Hebrew a combining mark is a vowel, not a diacritic, and
  * stripping it collapses distinct words ('กิน' eat vs 'กัน' together).
  * One implementation serves both sides of the engine — the column
  * expression for index builds (via StaticInvoke, codegen'd, whole-stage
  * spans stay intact) and the driver-side String form for query terms.
  */
object StringFold {

  /** Latin bases: ASCII letters + Latin-1 Supplement through Latin
    * Extended-B (the script fts5's diacritic table covers).
    */
  private def latinBase(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= 0x00C0 && cp <= 0x024F)

  def fold(s: String): String =
    if (s == null) null
    else {
      // fast path: ASCII can't carry marks, skip the normalizer alloc
      var ascii = true
      var i = 0
      while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
      if (ascii) s
      else {
        val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        val out = new java.lang.StringBuilder(nfd.length)
        var lastBase = 0
        var j = 0
        while (j < nfd.length) {
          val cp = nfd.codePointAt(j)
          val isMark = (1 << Character.getType(cp) &
            ((1 << Character.NON_SPACING_MARK) | (1 << Character.COMBINING_SPACING_MARK) |
              (1 << Character.ENCLOSING_MARK))) != 0
          if (isMark) {
            if (!latinBase(lastBase)) out.appendCodePoint(cp) // vowel mark, keep
          } else {
            lastBase = cp
            out.appendCodePoint(cp)
          }
          j += Character.charCount(cp)
        }
        // NFC restores any kept base+mark pairs to their composed form so
        // unfolded scripts round-trip byte-identically
        java.text.Normalizer.normalize(out.toString, java.text.Normalizer.Form.NFC)
      }
    }

  /** UTF8String overload — the StaticInvoke target. */
  def fold(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(fold(s.toString))
}

/** Column-level text primitives shared by the FTS index builder and the
  * text-analysis operators. One tokenizer for the whole engine (SURVEY §7.4
  * decision): lowercase, split on non-letter/non-digit runs — the common
  * ASCII-compatible core of fts5 `unicode61` (reference src/sifts/core.py:461)
  * and PG `simple` (core.py:612-614).
  *
  * Everything here is `org.apache.spark.sql.functions` composition — fully
  * codegen'd, no UDFs.
  */
object TextFunctions {

  /** Regex for token SEPARATORS. `\p{L}\p{N}` keeps letters/digits of any
    * script; on ASCII corpora this is exactly `[^a-z0-9]+` after lowercase.
    */
  val SeparatorRegex = "[^\\p{L}\\p{N}]+"

  /** content -> ARRAY<STRING> of lowercase tokens (empties dropped — `split`
    * yields "" at leading/trailing separators).
    */
  def tokens(content: Column): Column =
    filter(split(lower(content), SeparatorRegex), t => length(t) > lit(0))

  /** `tokens` with optional diacritic folding (fts5 `unicode61`
    * remove_diacritics parity). Folding happens BEFORE the split: combining
    * marks are `\p{M}`, not `\p{L}\p{N}`, so an unfolded decomposed
    * `é` would otherwise SPLIT its token.
    */
  def tokens(content: Column, fold: Boolean): Column =
    if (fold) tokens(foldAccents(content)) else tokens(content)

  /** Column form of [[StringFold.fold]] — codegen'd static call, null in ->
    * null out.
    */
  def foldAccents(content: Column): Column =
    Bridge.column(StaticInvoke(
      StringFold.getClass, StringType, "fold",
      Seq(Bridge.expression(content)), Seq(StringType),
      returnNullable = true))

  /** Distinct tokens, sorted — for set-based similarity (Jaccard). */
  def tokenSet(content: Column): Column = array_sort(array_distinct(tokens(content)))

  /** Word n-gram shingles (ARRAY<STRING> of space-joined n-grams), distinct,
    * first-occurrence order; empty for docs shorter than n tokens. Native
    * single-pass expression — the HOF formulation (`shinglesHof`) runs its
    * per-element lambdas interpreted and was ~100× slower on the dedup scans.
    */
  def shingles(toks: Column, n: Int): Column = HashFunctions.shingleArray(toks, n)

  /** All n-gram windows in order, duplicates kept (occurrence counting). */
  def shinglesAll(toks: Column, n: Int): Column = HashFunctions.shingleArrayAll(toks, n)

  /** Builtin-functions formulation of `shingles`, kept as the cross-check
    * reference for the native expression (ExtSpec asserts equality).
    */
  def shinglesHof(toks: Column, n: Int): Column = {
    // transform over indices 0..size-n, joining n consecutive tokens.
    // Docs with fewer than n tokens yield an EMPTY array — sequence(0,-1)
    // would otherwise produce [0,-1] and slice() throws on start=0.
    val grams = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))
    )
    when(size(toks) < lit(n), array().cast("array<string>"))
      .otherwise(array_distinct(grams))
  }

  /** Jaccard similarity of two ARRAY<STRING> set columns (inputs must be
    * distinct-element arrays). Double in [0,1]; 0 when both empty.
    */
  def jaccard(a: Column, b: Column): Column = HashFunctions.jaccardSim(a, b)

  /** Builtin-functions formulation of `jaccard` (cross-check reference). */
  def jaccardHof(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === lit(0.0), lit(0.0)).otherwise(inter / union)
  }

  /** Shannon entropy (nats) of a token array's unigram distribution —
    * per-row, zero shuffle. See [[TokenEntropy]]. */
  def tokenEntropy(toks: Column): Column =
    Bridge.column(TokenEntropy(Bridge.expression(toks)))

  /** First occurrence of each TRIMMED element form, original text and order
    * preserved — per-row, zero shuffle, O(total bytes). See
    * [[KeepFirstByTrim]]. */
  def keepFirstByTrim(lines: Column): Column =
    Bridge.column(KeepFirstByTrim(Bridge.expression(lines)))

  /** True iff `needle` occurs as a CONTIGUOUS run inside `haystack` (both
    * ARRAY<STRING>) — the phrase-adjacency test. See [[ContainsSlice]]. */
  def containsSlice(haystack: Column, needle: Column): Column =
    Bridge.column(ContainsSlice(Bridge.expression(haystack), Bridge.expression(needle)))

  /** Smallest token-position window containing ALL of `terms` (max pos −
    * min pos over the best occurrence selection); NULL when any term is
    * absent. See [[TokenMinSpan]]. */
  def tokenMinSpan(tokens: Column, terms: Column): Column =
    Bridge.column(TokenMinSpan(Bridge.expression(tokens), Bridge.expression(terms)))
}

/** Shannon entropy H = −Σ p_t ln p_t (nats) of the row's OWN token
  * distribution — the degenerate-repetition signal that complements the
  * Gopher top-n-gram fraction: near 0 = one token dominates, ln(n_types) =
  * perfectly uniform. Computed entirely inside the row (one hash-count pass
  * + one first-occurrence-ordered accumulation — deterministic summation
  * order run-to-run), so a corpus-wide entropy scan is ZERO-shuffle.
  * Empty/null arrays → 0.
  */
case class TokenEntropy(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._

  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_entropy"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      val t = xs.getUTF8String(i)
      counts.merge(t, 1, (a, b) => a + b)
      i += 1
    }
    // accumulate in FIRST-OCCURRENCE order (not HashMap order) so the
    // float sum is deterministic across runs and data layouts
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var h = 0.0
    i = 0
    while (i < n) {
      val t = xs.getUTF8String(i)
      if (seen.add(t)) {
        val p = counts.get(t).toDouble / n
        h -= p * math.log(p)
      }
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

/** Contiguous-subsequence test over token arrays: true iff `right` (the
  * phrase) occurs as an ADJACENT run, in order, inside `left` (the doc's
  * tokens). The verify stage of phrase search — runs per-row on the
  * postings-pruned candidate set only, zero shuffle. Single forward scan,
  * O(|haystack|·|needle|) worst case with the usual tiny constant (needle =
  * a user phrase, 2-5 tokens). Empty needle matches everything; null
  * elements (absent from `tokens()` output) never match. The HOF spelling
  * (`exists(sequence(...), i -> slice(...) == needle)`) allocates a slice
  * per position and runs its lambda interpreted — this is the flat native
  * form.
  */
case class ContainsSlice(left: org.apache.spark.sql.catalyst.expressions.Expression,
                         right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_slice"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<STRING>, ARRAY<STRING>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(h: Any, nd: Any): Any = {
    val hay = h.asInstanceOf[ArrayData]
    val needle = nd.asInstanceOf[ArrayData]
    val m = needle.numElements()
    if (m == 0) return true
    val n = hay.numElements()
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        ok = !hay.isNullAt(i + j) && !needle.isNullAt(j) &&
          hay.getUTF8String(i + j) == needle.getUTF8String(j)
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression) = copy(left = l, right = r)
}

/** Minimum-window span over token positions: the smallest (max pos − min
  * pos) of any position selection covering ALL of `right`'s (distinct)
  * terms inside `left`'s token array — the NEAR-operator primitive
  * (fts5 `NEAR(a b, k)` admits a doc iff span ≤ k; adjacency is span
  * = |terms|−1 — phrase search is the stricter ORDERED cousin). NULL when
  * any term is missing (or the term set is empty). Classic one-pass
  * min-window scan: advance over tokens keeping each term's last position;
  * every time all terms have been seen, the window ending here is
  * (i − min lastSeen) — O(|tokens|·|terms|), per-row, zero shuffle, the
  * verify stage over postings-pruned candidates.
  */
case class TokenMinSpan(left: org.apache.spark.sql.catalyst.expressions.Expression,
                        right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "token_min_span"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<STRING>, ARRAY<STRING>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(h: Any, t: Any): Any = {
    val toks = h.asInstanceOf[ArrayData]
    val terms = t.asInstanceOf[ArrayData]
    val m = terms.numElements()
    if (m == 0) return null
    // Integer values, not Int: an erased get() miss returns null, which a
    // primitive Int would silently unbox to 0 — a VALID index
    val idx = new java.util.HashMap[UTF8String, Integer](m * 2)
    var j = 0
    while (j < m) {
      if (!terms.isNullAt(j))
        idx.putIfAbsent(terms.getUTF8String(j), Integer.valueOf(idx.size))
      j += 1
    }
    val k = idx.size
    if (k == 0) return null
    val last = Array.fill(k)(-1)
    var seen = 0
    var best = Int.MaxValue
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val p = idx.get(toks.getUTF8String(i))
        if (p != null) {
          val pi = p.intValue
          if (last(pi) < 0) seen += 1
          last(pi) = i
          if (seen == k) {
            var lo = Int.MaxValue
            var q = 0
            while (q < k) { if (last(q) < lo) lo = last(q); q += 1 }
            if (i - lo < best) best = i - lo
          }
        }
      }
      i += 1
    }
    if (best == Int.MaxValue) null else best
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression) = copy(left = l, right = r)
}

/** Single-pass first-occurrence filter over an ARRAY<STRING> by TRIMMED
  * form: keeps element i iff no earlier element shares its trimmed text,
  * preserving the FIRST occurrence's original (untrimmed) form and the
  * array order. The native replacement for the HOF construction
  * `filter(xs, (l, i) => !exists(slice(xs, 1, i), p => trim(p) === trim(l)))`,
  * which is O(lines²) per row — a pathological 50k-line document would pay
  * ~10⁹ comparisons in one task; this hash-set pass is O(total bytes).
  * Null elements (absent from split() output) dedup like a distinct form:
  * first kept, rest dropped.
  */
case class KeepFirstByTrim(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def dataType: DataType = child.dataType
  override def prettyName: String = "keep_first_by_trim"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val seen = new java.util.HashSet[UTF8String](n * 2)
    val out = new java.util.ArrayList[Any](n)
    var sawNull = false
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) {
        if (!sawNull) { sawNull = true; out.add(null) }
      } else {
        val line = xs.getUTF8String(i)
        // trim() matches SQL trim(): ASCII space 0x20 both ends
        if (seen.add(line.trim())) out.add(line)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}
