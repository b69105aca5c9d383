package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Zero-shuffle Naive-Bayes scoring kernel for
  * [[graft.ext.Classify.scoreQualityNb]].
  *
  * The NB log-odds of a document is bias + Σ over token INSTANCES of
  * w(tok) (tf·w summed per distinct token is the same sum regrouped), so
  * no per-doc tf aggregation — and therefore no shuffle of the corpus's
  * (id, token) pairs — is ever needed: with the vocabulary-sized weights
  * map resident on each executor, scoring is a pure per-row scan. This
  * expression is that scan: it re-implements the house tokenizer
  * ([[TextFunctions.tokens]]: lowercase, split on `[^\p{L}\p{N}]+`) as a
  * single forward pass and folds each in-vocabulary token's weight into a
  * running double. Out-of-vocabulary tokens are ignored (the model's
  * vocabulary-closed convention); null in → null out (the caller coalesces
  * to the bare prior).
  *
  * With `bigrams` set, each ADJACENT token pair additionally contributes
  * the weight of the hashed feature `bg:` + md5("tok1 tok2") — the same
  * feature key the training side and the DuckDB oracle derive with their
  * own md5, so the hashed feature space is engine-replayable.
  *
  * The weights ride a [[Broadcast]] (fetched once per executor, not per
  * task) and the lookup HashMap is built once per JVM via the same
  * `computeIfAbsent` cache pattern as [[PhraseAutomaton.cached]] — an
  * `@transient lazy val` alone would rebuild a million-entry map per TASK
  * (the measured GC-storm failure mode of the automaton).
  */
case class NbScoreExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    weights: Broadcast[Array[(String, Double)]],
    bias: Double,
    bigrams: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._

  override def dataType: DataType = DoubleType
  override def prettyName: String = "nb_score"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires STRING, got ${other.catalogString}")
    }

  @transient private lazy val map = NbScoreExpr.cachedMap(weights)

  override def nullSafeEval(input: Any): Any = {
    // UTF8String.toLowerCase = what lower() computes (locale-independent),
    // so the scan tokenizes exactly like split(lower(content), …)
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val n = s.length
    var sum = bias
    var i = 0
    var prev: String = null
    while (i < n) {
      // skip the separator run
      var cp = s.codePointAt(i)
      while (i < n && !NbScoreExpr.isTokenChar(cp)) {
        i += Character.charCount(cp)
        if (i < n) cp = s.codePointAt(i)
      }
      if (i < n) {
        val start = i
        while (i < n && NbScoreExpr.isTokenChar(cp)) {
          i += Character.charCount(cp)
          if (i < n) cp = s.codePointAt(i)
        }
        val tok = s.substring(start, i)
        val w = map.get(tok)
        if (w != null) sum += w.doubleValue()
        if (bigrams) {
          if (prev != null) {
            val bw = map.get(NbScoreExpr.bigramFeature(prev, tok))
            if (bw != null) sum += bw.doubleValue()
          }
          prev = tok
        }
      }
    }
    sum
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

object NbScoreExpr {
  private val MaxCached = 8
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), java.util.HashMap[String, java.lang.Double]]()

  /** Executor-JVM-wide weights map, keyed by (application id, broadcast
    * id): the broadcast block is fetched once per executor, and this
    * cache makes the HashMap build (O(|V|)) happen once per JVM too, not
    * once per task. The APP id is part of the key because broadcast ids
    * restart from 0 with a new SparkContext in the same JVM (local mode,
    * test restarts) — a bare-id entry from a previous context would
    * silently serve the WRONG model's weights. (Keying by the Broadcast
    * INSTANCE would not work: each task deserializes its own wrapper
    * object, so identity keying rebuilds per task — the GC-storm failure
    * this cache exists to prevent.) Bounded crudely like
    * [[PhraseAutomaton]]'s cache (a session scores against a handful of
    * models, not a churn of them); the bound also evicts dead-context
    * entries eventually.
    */
  def cachedMap(b: Broadcast[Array[(String, Double)]])
      : java.util.HashMap[String, java.lang.Double] = {
    // SparkEnv exists on driver and executors alike; local mode shares it
    val appId = org.apache.spark.SparkEnv.get.conf.getAppId
    val key = (appId, b.id)
    val got = cache.get(key)
    if (got != null) got
    else {
      if (cache.size >= MaxCached) cache.clear()
      cache.computeIfAbsent(key, _ => {
        val arr = b.value
        val m = new java.util.HashMap[String, java.lang.Double](arr.length * 2)
        var i = 0
        while (i < arr.length) {
          m.put(arr(i)._1, java.lang.Double.valueOf(arr(i)._2))
          i += 1
        }
        m
      })
    }
  }

  /** Java-regex `[\p{L}\p{N}]` parity: isLetter covers exactly the L
    * categories; the N categories are Nd/Nl/No.
    */
  private[functions] def isTokenChar(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The hashed bigram feature key: `bg:` + md5 hex of "a b" (UTF-8) —
    * byte-identical to Spark's `md5(concat(a, ' ', b))` and DuckDB's
    * `md5(a || ' ' || b)`, so the training aggregate, this scan, and the
    * oracle all live in the same feature space.
    */
  def bigramFeature(a: String, b: String): String = {
    val d = md.get()
    d.reset()
    d.update(a.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.update(' '.toByte)
    d.update(b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bytes = d.digest()
    val out = new Array[Char](3 + 32)
    out(0) = 'b'; out(1) = 'g'; out(2) = ':'
    var i = 0
    while (i < 16) {
      out(3 + i * 2) = hexDigits((bytes(i) >> 4) & 0xf)
      out(3 + i * 2 + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Column form. */
  def nbScore(content: Column, weights: Broadcast[Array[(String, Double)]],
              bias: Double, bigrams: Boolean): Column =
    Bridge.column(NbScoreExpr(Bridge.expression(content), weights, bias, bigrams))
}
