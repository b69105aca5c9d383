package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
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
  * replays in DuckDB as plain SQL (the x127 oracle does exactly that).
  *
  * The reference has no classifier surface (core.py has no training
  * operators at all); new-scope for the training-data pipeline.
  */
object Classify {

  /** A trained binary NB model: `weights` = one (tok, w) row per training
    * token with w = log P(tok|pos) − log P(tok|neg) (Laplace-smoothed),
    * `bias` = log(n_pos_docs / n_neg_docs) (the class-prior log-odds),
    * `vocabSize` = |V| (distinct training tokens, the smoothing
    * denominator's width). A document's score is
    * bias + Σ_tokens tf · w(tok), i.e. the NB log-odds
    * log P(pos|doc) − log P(neg|doc); tokens unseen in training carry no
    * evidence either way and are IGNORED (both smoothed likelihoods would
    * contribute the same constant only under equal totals — dropping them
    * is the standard vocabulary-closed NB convention, and is what keeps
    * the score a pure join against the skinny weights frame).
    *
    * `weights` is lazy like any DataFrame — persist() it for repeated
    * scoring, unpersist when done (the model frame is vocabulary-sized:
    * skinny (string, double) rows, broadcast-joinable for most corpora).
    */
  final case class NbModel(weights: DataFrame, bias: Double, vocabSize: Long)

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
                     smoothing: Double = 1.0): NbModel = {
    require(smoothing > 0.0, "smoothing > 0")
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(TextFunctions.tokens(col(contentCol))).as("tok"))
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
    NbModel(w, math.log(dp.toDouble / dn), v)
  }

  /** Score documents with a trained model: (idCol passthrough, `logodds`).
    * Positive log-odds = more pos-like than neg-like under NB. Every input
    * doc gets a row — a doc with no in-vocabulary tokens scores exactly
    * `bias` (the prior alone).
    *
    * Scale: per-doc tf rows (explode + count — linear, the postings-build
    * shape) join the skinny weights (broadcast when the vocabulary fits,
    * AQE's call), one map-side-combined sum per doc, one left join back to
    * the ids. Content never shuffles; the shuffled rows are (id, tok, tf)
    * longs and the per-doc partial sums.
    */
  def scoreQualityNb(docs: DataFrame, model: NbModel, idCol: String = "id",
                     contentCol: String = "content"): DataFrame = {
    val tf = docs.select(col(idCol).as(idCol),
        explode(TextFunctions.tokens(col(contentCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__tf"))
    val sums = tf.join(model.weights, Seq("tok"))
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
