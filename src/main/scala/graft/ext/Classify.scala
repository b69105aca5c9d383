package graft.ext

import graft.functions.{NbScoreExpr, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable QUALITY CLASSIFIER for corpus curation — the discriminative
  * filtering step of CCNet/GPT-3/DCLM-style pipelines ("train a cheap
  * classifier on known-good vs known-bad text, keep what scores good"),
  * which none of the statistical signals (X9 quality, X27/X44 perplexity,
  * X77 DSIR) covers: those score against a FIXED recipe or a target
  * distribution; this one LEARNS from labeled examples.
  *
  * The model is binary multinomial Naive Bayes over the house tokenizer's
  * tokens — the classic cheap text classifier (the linear-in-token-counts
  * family fastText's bag-of-words mode belongs to), chosen deliberately:
  * training is CLOSED-FORM (two token-count aggregates — no SGD, no
  * iteration order, no initialization), so the model is deterministic
  * bit-for-bit across runs/engines and the whole train+score pipeline
  * replays in DuckDB as plain SQL (the x127/x127b oracles do exactly that).
  *
  * Feature space: unigram tokens, optionally plus HASHED BIGRAMS
  * (`bg:` + md5("tok1 tok2") per adjacent pair) — the fastText-style
  * word-bigram signal the DCLM/WebText-class quality filters lean on,
  * hashed through the house md5 so the feature keys stay engine-replayable
  * and the closed form survives.
  *
  * The reference has no classifier surface (core.py has no training
  * operators at all); new-scope for the training-data pipeline.
  */
object Classify {

  /** A trained binary NB model: `weights` = one (tok, w) row per training
    * feature with w = log P(f|pos) − log P(f|neg) (Laplace-smoothed),
    * `bias` = log(n_pos_docs / n_neg_docs) (the class-prior log-odds),
    * `vocabSize` = |V| (distinct training features, the smoothing
    * denominator's width), `bigrams` = whether the feature space includes
    * the hashed adjacent-pair features. A document's score is
    * bias + Σ_feature-instances w(f), i.e. the NB log-odds
    * log P(pos|doc) − log P(neg|doc); features unseen in training carry no
    * evidence either way and are IGNORED (both smoothed likelihoods would
    * contribute the same constant only under equal totals — dropping them
    * is the standard vocabulary-closed NB convention, and is what keeps
    * the model a skinny vocabulary-sized (string, double) frame).
    *
    * `weights` is lazy like any DataFrame — persist() it for repeated
    * scoring, unpersist when done (the model frame is vocabulary-sized:
    * skinny rows, collect/broadcast-able by construction).
    */
  final case class NbModel(weights: DataFrame, bias: Double, vocabSize: Long,
                           bigrams: Boolean = false)

  /** One row per feature INSTANCE of each document: unigram tokens, plus
    * (when `bigrams`) the hashed adjacent-pair features. md5 runs AFTER the
    * explode as a flat projection (HOF lambdas evaluate interpreted — the
    * zip_with here only concats; the hash is codegen'd downstream).
    */
  private def featureInstances(df: DataFrame, contentCol: String,
                               bigrams: Boolean): DataFrame = {
    val t = TextFunctions.tokens(col(contentCol))
    val uni = df.select(explode(t).as("tok"))
    if (!bigrams) uni
    else {
      val pairs = zip_with(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a: Column, b: Column) => concat(a, lit(" "), b))
      uni.unionByName(df.select(explode(pairs).as("p"))
        .select(concat(lit("bg:"), md5(col("p"))).as("tok")))
    }
  }

  /** Train the binary NB quality model from a GOOD corpus and a BAD corpus
    * (e.g. a curated reference set vs raw crawl). Two token-count
    * aggregates + one scalar row to the driver; Laplace smoothing
    * `smoothing` (α > 0). Runs two passes over the training corpora (the
    * count aggregate and the weights frame share lineage — persist the
    * result's `weights` if scoring repeatedly).
    *
    * Scale: training cost is one explode+count per side — the postings
    * build's shape, linear in training tokens, map-side combined. The
    * model never materializes on the driver; only (|V|, N_pos, N_neg) do.
    */
  def trainQualityNb(pos: DataFrame, neg: DataFrame,
                     contentCol: String = "content",
                     smoothing: Double = 1.0,
                     bigrams: Boolean = false): NbModel = {
    require(smoothing > 0.0, "smoothing > 0")
    def counts(df: DataFrame, as: String): DataFrame =
      featureInstances(df, contentCol, bigrams)
        .groupBy(col("tok")).agg(count(lit(1)).as(as))
    val joined = counts(pos, "__cp").join(counts(neg, "__cn"), Seq("tok"), "full")
      .select(col("tok"),
        coalesce(col("__cp"), lit(0L)).as("__cp"),
        coalesce(col("__cn"), lit(0L)).as("__cn"))
    val s = joined.agg(count(lit(1)).as("v"),
      coalesce(sum(col("__cp")), lit(0L)).as("np"),
      coalesce(sum(col("__cn")), lit(0L)).as("nn")).head()
    val (v, np, nn) = (s.getLong(0), s.getLong(1), s.getLong(2))
    require(v > 0L, "training corpora produced no tokens")
    val dp = pos.count()
    val dn = neg.count()
    require(dp > 0L && dn > 0L, "both classes need at least one document")
    // denominators as driver doubles: integer counts < 2^53 are exact, so
    // the engine and the SQL oracle compute the identical IEEE value
    val denP = np + smoothing * v
    val denN = nn + smoothing * v
    val w = joined.select(col("tok"),
      (log((col("__cp") + lit(smoothing)) / lit(denP)) -
        log((col("__cn") + lit(smoothing)) / lit(denN))).as("w"))
    NbModel(w, math.log(dp.toDouble / dn), v, bigrams)
  }

  /** Score documents with a trained model: (idCol passthrough, `logodds`).
    * Positive log-odds = more pos-like than neg-like under NB. Every input
    * doc gets a row — a doc with no in-vocabulary tokens (or NULL content)
    * scores exactly `bias` (the prior alone).
    *
    * Scale: a ZERO-SHUFFLE scan. The score is Σ over token instances of
    * w(tok) — no per-doc tf grouping exists to compute — so the weights
    * (vocabulary-sized by construction) are collected once, broadcast, and
    * folded into a running sum per row by [[NbScoreExpr]]; the corpus's
    * tokens never leave their input partitions. The executor-side lookup
    * map is built once per JVM (the [[graft.functions.PhraseAutomaton]]
    * cache pattern). The previous formulation — explode → groupBy(id, tok)
    * → join weights → re-aggregate — shuffled every (id, token) pair of
    * the corpus twice for the same sum (measured 39.1 s vs single digits
    * at 2M docs); [[scoreQualityNbJoin]] keeps that shape for arm-vs-arm
    * parity testing.
    */
  def scoreQualityNb(docs: DataFrame, model: NbModel, idCol: String = "id",
                     contentCol: String = "content",
                     maxBroadcastFeatures: Long = 32L * 1000 * 1000): DataFrame = {
    // gate the collect/broadcast on the model's FEATURE count (vocabSize
    // counts every trained feature, bigrams included — with bigrams the
    // space can be 10-100x the unigram vocabulary): above the threshold
    // (default 32M ≈ a multi-GB driver array, the practical broadcast
    // ceiling) fall back to the join arm's distributed shape instead of
    // OOMing the driver
    if (model.vocabSize > maxBroadcastFeatures)
      return scoreQualityNbJoin(docs, model, idCol, contentCol)
    val w = model.weights.select(col("tok"), col("w")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val bc = docs.sparkSession.sparkContext.broadcast(w)
    docs.select(col(idCol),
      coalesce(
        NbScoreExpr.nbScore(col(contentCol), bc, model.bias, model.bigrams),
        lit(model.bias)).as("logodds"))
  }

  /** The join-formulated scorer — same math as [[scoreQualityNb]] through
    * per-doc tf grouping and a weights join (tf·w summed per distinct
    * feature = the instance sum regrouped). Kept as the arm the specs
    * diff-fuzz the scan against; the scan is the serving path (this shape
    * shuffles the corpus's (id, feature) pairs, the scan shuffles nothing).
    */
  def scoreQualityNbJoin(docs: DataFrame, model: NbModel, idCol: String = "id",
                         contentCol: String = "content"): DataFrame = {
    val t = TextFunctions.tokens(col(contentCol))
    val uni = docs.select(col(idCol), explode(t).as("tok"))
    val inst =
      if (!model.bigrams) uni
      else {
        val pairs = zip_with(
          slice(t, lit(1), greatest(size(t) - 1, lit(0))),
          slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a: Column, b: Column) => concat(a, lit(" "), b))
        uni.unionByName(docs.select(col(idCol), explode(pairs).as("p"))
          .select(col(idCol), concat(lit("bg:"), md5(col("p"))).as("tok")))
      }
    val sums = inst.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__tf"))
      .join(model.weights, Seq("tok"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf").cast("double") * col("w")).as("__s"))
    docs.select(col(idCol)).join(sums, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("__s"), lit(0.0)) + lit(model.bias)).as("logodds"))
  }

  /** Curation form: keep the docs scoring ≥ `minLogOdds` (0 = "more
    * pos-like than not" under the learned model + prior). Schema
    * passthrough via a left-semi join on the scored ids.
    */
  def filterByNb(docs: DataFrame, model: NbModel, minLogOdds: Double = 0.0,
                 idCol: String = "id",
                 contentCol: String = "content"): DataFrame =
    docs.join(
      scoreQualityNb(docs, model, idCol, contentCol)
        .filter(col("logodds") >= minLogOdds).select(col(idCol)),
      Seq(idCol), "left_semi")
}
