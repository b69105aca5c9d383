package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair encoding (Sennrich et al. 2016) — real learned
  * subword tokenization, not the regex approximation in
  * [[TextStats.tokenCounts]]. The key scale property: BPE training needs
  * only the WORD-FREQUENCY table, never the corpus itself — so the Spark
  * side is one explode + map-side-combined word agg bounded to `maxWords`
  * word types via a TakeOrdered (count desc, word asc — deterministic cut),
  * and the merge loop is O(numMerges × words × avgLen) driver-side
  * arithmetic over that bounded table. The corpus is read once and nothing
  * wider than (word, count) ever shuffles; at 100 TB the word-type table is
  * megabytes where the corpus is terabytes.
  *
  * Encoding applies the learned merges per word, lowest-rank-first until
  * fixpoint (the standard rank-greedy scheme). The per-word merge loop is
  * genuine iterative per-row logic no built-in column function expresses,
  * so it is a Scala UDF over the ALREADY-TOKENIZED array — tokenization
  * stays the engine's codegen'd [[TextFunctions.tokens]]; only the merge
  * application crosses into the UDF (the same tier as the Embedder /
  * MediaDecoder batch contracts). The model (≤ numMerges pairs) rides the
  * closure — kilobytes.
  */
object Bpe {

  /** An ordered merge list; earlier = higher priority. */
  final case class Model(merges: Vector[(String, String)]) {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Splits one (already-lowercased) word into learned subword units:
      * start from characters, repeatedly merge every occurrence of the
      * present pair with the lowest rank. Deterministic; "" -> empty.
      */
    def encodeWord(word: String): Vector[String] = {
      if (word == null || word.isEmpty) return Vector.empty
      var parts: Vector[String] = word.map(_.toString).toVector
      var continue = parts.length > 1
      while (continue) {
        var bestRank = Int.MaxValue
        var best: (String, String) = null
        var j = 0
        while (j < parts.length - 1) {
          val r = rank.getOrElse((parts(j), parts(j + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; best = (parts(j), parts(j + 1)) }
          j += 1
        }
        if (best == null) continue = false
        else {
          parts = mergePair(parts, best)
          continue = parts.length > 1
        }
      }
      parts
    }

    /** (rank, left, right) frame — persist next to a collection store and
      * restore with [[Bpe.fromFrame]].
      */
    def toFrame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
        .toDF("rank", "left", "right")
    }
  }

  /** Merges every left-to-right non-overlapping occurrence of `p`. */
  private def mergePair(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += (p._1 + p._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** The classic merge-learning loop over a word-frequency table: pick the
    * most frequent adjacent symbol pair (ties lexicographic — fully
    * deterministic), merge it everywhere, repeat. Stops early when no pair
    * remains (every word fully merged).
    */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int): Model = {
    require(numMerges >= 0, "numMerges >= 0")
    var words: Seq[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.keysIterator.reduceLeft { (x, y) =>
          val cx = pairCounts(x); val cy = pairCounts(y)
          if (cy > cx || (cy == cx && (y._1 < x._1 ||
            (y._1 == x._1 && y._2 < x._2)))) y else x
        }
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        i += 1
      }
    }
    Model(merges.result())
  }

  /** Trains on the corpus: ONE bounded word-frequency agg (the ≤ `maxWords`
    * rows collected to the driver are the training input by contract, like
    * the IVF centroid table), then [[trainFromCounts]].
    */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 50000,
            contentCol: String = "content"): Model = {
    require(maxWords >= 1, "maxWords >= 1")
    val counts = docs
      .select(explode(TextFunctions.tokens(col(contentCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainFromCounts(counts, numMerges)
  }

  /** ARRAY<STRING> of words -> ARRAY<STRING> of subword units. */
  def encoder(model: Model): UserDefinedFunction =
    udf((ws: Seq[String]) =>
      if (ws == null) null else ws.flatMap(model.encodeWord))

  /** Adds `bpe_tokens` (learned subword units of the tokenized content, in
    * order) and `n_bpe_learned`. Null content -> empty tokens, 0 count —
    * consistent with the rest of the token accounting.
    */
  def encode(df: DataFrame, model: Model,
             contentCol: String = "content"): DataFrame = {
    val toks = coalesce(TextFunctions.tokens(col(contentCol)),
      array().cast("array<string>"))
    df.withColumn("bpe_tokens", encoder(model)(toks))
      .withColumn("n_bpe_learned", size(col("bpe_tokens")).cast("long"))
  }

  /** Restores a model from [[Model.toFrame]] output (rank order). */
  def fromFrame(df: DataFrame): Model =
    Model(df.select(col("rank"), col("left"), col("right"))
      .orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toVector)
}
