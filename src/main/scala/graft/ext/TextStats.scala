package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (new-scope per
  * BASELINE.json): language ID, quality scoring, token counting, document
  * fingerprinting, corpus aggregation. All pure `functions._` composition —
  * codegen'd scans, shuffle only where an aggregation demands it.
  *
  * Every heuristic here is deliberately closed-form (list membership +
  * arithmetic) so an independent SQL engine can replay it exactly — that is
  * what the correctness oracle does.
  */
object TextStats {

  /** Stopword lists for the n-gram/stopword language-ID heuristic. Order is
    * the tie-break priority.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "de")
  )

  /** English stopwords used by the quality score. */
  val QualityStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "is", "in")

  private def occurrences(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Adds `pred_lang`: the language whose stopword list has the most token
    * occurrences; ties go to the earlier list; zero everywhere -> "und"
    * (ISO 639-3 undetermined).
    */
  def langId(df: DataFrame, contentCol: String = "content",
             outCol: String = "pred_lang"): DataFrame = {
    val toks = TextFunctions.tokens(col(contentCol))
    val scores = LangStopwords.map { case (lang, words) => lang -> occurrences(toks, words) }
    val scored = df.withColumns(scores.map { case (l, c) => s"__s_$l" -> c }.toMap)
    val allZero = scores.map { case (l, _) => col(s"__s_$l") === 0 }.reduce(_ && _)
    // argmax with list-order tie-break: lang_i wins iff s_i >= s_j for all j > i.
    val langs = LangStopwords.map(_._1)
    val pick = langs.zipWithIndex.foldRight(lit(langs.last)) { case ((l, i), els) =>
      val beatsLater = langs.drop(i + 1)
        .map(j => col(s"__s_$l") >= col(s"__s_$j"))
        .foldLeft(lit(true))(_ && _)
      when(beatsLater, lit(l)).otherwise(els)
    }
    scored
      .withColumn(outCol, when(allZero, lit("und")).otherwise(pick))
      .drop(langs.map(l => s"__s_$l"): _*)
  }

  /** Adds token/length metrics and a [0,1] `quality` score:
    * 0.5·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.2·min(1, avg_token_len/10).
    * (The standard length/stopword/word-shape heuristic family; exact
    * weights are this engine's pinned definition.)
    */
  def quality(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val toks = TextFunctions.tokens(col(contentCol))
    val nTok = size(toks).cast("double")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
    val stops = occurrences(toks, QualityStopwords).cast("double")
    val avgLen = when(nTok === 0, lit(0.0)).otherwise(sumLen / nTok)
    val stopRatio = when(nTok === 0, lit(0.0)).otherwise(stops / nTok)
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("avg_token_len", avgLen)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality",
        least(nTok / 100.0, lit(1.0)) * 0.5 + stopRatio * 0.3 +
          least(avgLen / 10.0, lit(1.0)) * 0.2)
  }

  /** Adds `n_ws` (whitespace token count) and `n_bpe` (BPE-ish subword
    * count: letter runs, digit runs, and single non-alnum glyphs — the
    * pre-tokenizer split of byte-pair encoders).
    */
  def tokenCounts(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val ws = filter(split(col(contentCol), "\\s+"), t => length(t) > 0)
    val bpe = regexp_extract_all(lower(col(contentCol)),
      lit("[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]"), lit(0))
    df.withColumn("n_ws", size(ws).cast("long"))
      .withColumn("n_bpe", size(bpe).cast("long"))
  }

  /** Corpus vocabulary report: the `k` most frequent tokens (engine
    * tokenizer), with document frequency and corpus-mass fraction — the
    * table a tokenizer-training or stopword-curation step reads first.
    * Ties break by token text, so the cut is deterministic. `rank` is
    * 1-based by (count desc, token asc).
    *
    * Scale: one explode + map-side-combined (token, doc)-distinct agg —
    * token cardinality, not raw occurrence count, crosses the final
    * shuffle — then a bounded TakeOrdered for the top-k (never a full
    * sort). The corpus total joins as a broadcast scalar computed by a
    * SECOND, column-pruned pass: Catalyst strips the count-distinct
    * machinery from that branch (explode + plain token count only), which
    * is cheaper than pinning both branches to one shared fat aggregate —
    * the plan-shape spec asserts the pruning holds. No driver-side action
    * inside the operator. The post-limit rank window is unpartitioned BY
    * DESIGN: it runs over k rows, not the corpus.
    */
  def topTokens(df: DataFrame, k: Int = 100, idCol: String = "id",
                contentCol: String = "content"): DataFrame = {
    require(k >= 1, "k >= 1")
    val toks = TextFunctions.tokens(col(contentCol))
    val counts = df
      .select(col(idCol).as("id"), explode(toks).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"), count_distinct(col("id")).as("doc_freq"))
    val total = counts.agg(coalesce(sum(col("cnt")), lit(1L)).as("__tot"))
    counts
      .orderBy(col("cnt").desc, col("tok").asc).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok").asc)))
      .withColumn("corpus_frac", col("cnt").cast("double") / col("__tot"))
      .select(col("rank"), col("tok"), col("cnt"), col("doc_freq"),
        col("corpus_frac"))
  }

  /** Per-group token-length histogram with cumulative distribution — the
    * corpus-composition report a mixture designer reads before setting
    * [[Pipeline.mixCorpora]] weights or a [[Pipeline.chunkDocuments]]
    * window. One row per (group, bucket) where `bucket` =
    * n_tokens / `bucketWidth` (integer division, whitespace tokens — the
    * [[Pipeline]] accounting definition): `lo_tokens` (bucket lower
    * bound), `n_docs`, `token_mass`, and the running `cum_docs` /
    * `cum_frac` (fraction of the group's docs at or below this bucket —
    * exact quantiles read straight off the curve: p95 doc length is the
    * first bucket with cum_frac ≥ 0.95). Null/empty docs land in bucket 0.
    *
    * Scale: exact and still 100 TB-shaped — one codegen'd scan + one
    * map-side-combined (group, bucket) agg; the cumulative window runs
    * over the AGGREGATED frame (#groups × #buckets rows, thousands at
    * most), never over docs. A per-group percentile over raw rows would
    * need a per-group global sort; bucketing to `bucketWidth` granularity
    * is what buys exactness without one.
    */
  def lengthHistogram(df: DataFrame, bucketWidth: Long = 64,
                      groupCol: String = "source",
                      contentCol: String = "content"): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth >= 1")
    val nTok = Pipeline.wsTokenCount(col(contentCol))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col(groupCol))
    // floor() on both engines (a bare double->int cast truncates in Spark
    // but ROUNDS in DuckDB — the oracle would diverge on exact multiples)
    df.select(col(groupCol), floor(nTok / bucketWidth).cast("long").as("bucket"),
        nTok.as("__nt"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("token_mass"))
      .withColumn("lo_tokens", col("bucket") * bucketWidth)
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_frac", col("cum_docs") / sum(col("n_docs")).over(tot))
      .select(col(groupCol), col("bucket"), col("lo_tokens"), col("n_docs"),
        col("token_mass"), col("cum_docs"), col("cum_frac"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1 quality
    * filters), per doc:
    *   - `n_lines`, `dup_line_frac`: 1 − distinct/total over non-empty
    *     lines (0 for single-line docs);
    *   - `top_ngram_tf`: occurrence count of the doc's most frequent word
    *     `n`-gram (0 if the doc has < n tokens);
    *   - `top_ngram_frac`: tokens covered by that gram's occurrences
    *     (tf × n) over the doc's token count, capped at 1.0 — overlapping
    *     occurrences ("w w w w", n=2 → tf=3) would otherwise push the
    *     nominal fraction past 1, which no threshold user expects.
    * High values on any of these are the classic boilerplate/SEO-spam
    * signals a pretraining filter drops.
    *
    * Scale: the whole metric is a single codegen'd scan — the per-doc gram
    * count is [[graft.functions.MaxMultiplicity]], one hash-map pass inside
    * the row, ZERO shuffle and no join. (The previous explode →
    * groupBy(id, gram) → groupBy(id) max shape shuffled every gram
    * occurrence and went superlinear on duplicated-content corpora:
    * 3.9× time for 2× docs at 200-copy clusters.)
    */
  def repetition(df: DataFrame, contentCol: String = "content",
                 n: Int = 2): DataFrame = {
    val lines = filter(split(col(contentCol), "\n"), l => length(trim(l)) > 0)
    val toks = TextFunctions.tokens(col(contentCol))
    // the token count rides on the caller's frame — collision-free name
    val nt = graft.ext.WorkingColumns.fresh(df, "__n_toks")
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("dup_line_frac",
        when(size(lines) === 0, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines)))
      .withColumn(nt, size(toks).cast("long"))
      // coalesce: null content -> null shingle array -> null count; the
      // operator's contract (and the old explode/join shape) is 0
      .withColumn("top_ngram_tf",
        coalesce(graft.functions.HashFunctions.maxMultiplicity(
          TextFunctions.shinglesAll(toks, n)), lit(0L)))
      .withColumn("top_ngram_frac",
        when(col(nt) === 0, lit(0.0)).otherwise(
          least(lit(1.0), col("top_ngram_tf") * n / col(nt))))
      .drop(nt)
  }

  /** The Gopher stop-word presence list (Rae et al. 2021 §A1.1): a kept
    * doc must contain at least `minStopwordHits` DISTINCT words of these.
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-level quality filter (Rae et al. 2021 §A1.1) as
    * ONE call — the standard pretraining keep/drop decision, with the
    * published defaults. Adds the per-rule metrics plus `keep`:
    *   - `n_words` within [minWords, maxWords] (whitespace words — the
    *     [[Pipeline]] accounting definition);
    *   - `mean_word_len` within [minMeanWordLen, maxMeanWordLen];
    *   - `alpha_word_frac` (words containing an A-Za-z letter) ≥
    *     minAlphaWordFrac;
    *   - `bullet_line_frac` (trimmed lines starting `-`/`*`/`•`) ≤
    *     maxBulletLineFrac and `ellipsis_line_frac` (lines ending `...` or
    *     `…`) ≤ maxEllipsisLineFrac;
    *   - `n_stop_hits` (distinct [[GopherStops]] present) ≥
    *     minStopwordHits;
    *   - [[repetition]]'s `dup_line_frac` ≤ maxDupLineFrac and
    *     `top_ngram_frac` ≤ maxTopNgramFrac (2-grams).
    * Null/empty docs fail the word-count floor and drop. Filter with
    * `.filter(col("keep"))`; the metrics stay for threshold tuning.
    *
    * Scale: composes [[repetition]] — still a single codegen'd scan,
    * ZERO shuffle; every rule is closed-form column math (and therefore
    * DuckDB-replayable, which is what pins it).
    */
  def gopherFilter(df: DataFrame, contentCol: String = "content",
                   minWords: Long = 50, maxWords: Long = 100000,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   minAlphaWordFrac: Double = 0.8,
                   maxBulletLineFrac: Double = 0.9,
                   maxEllipsisLineFrac: Double = 0.3,
                   minStopwordHits: Int = 2,
                   maxDupLineFrac: Double = 0.3,
                   maxTopNgramFrac: Double = 0.2): DataFrame = {
    val ws = filter(split(col(contentCol), "\\s+"), t => length(t) > 0)
    val nW = when(col(contentCol).isNull, lit(0L)).otherwise(size(ws).cast("long"))
    val sumLen = aggregate(coalesce(ws, array().cast("array<string>")),
      lit(0L), (a, t) => a + length(t)).cast("double")
    val meanLen = when(nW === 0, lit(0.0)).otherwise(sumLen / nW)
    val alphaFrac = when(nW === 0, lit(0.0)).otherwise(
      size(filter(ws, t => t.rlike("[A-Za-z]"))).cast("double") / nW)
    val lines = filter(transform(split(col(contentCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val nL = when(col(contentCol).isNull, lit(0L)).otherwise(size(lines).cast("long"))
    val bulletFrac = when(nL === 0, lit(0.0)).otherwise(
      size(filter(lines, l => l.rlike("^[-*•]"))).cast("double") / nL)
    val ellipsisFrac = when(nL === 0, lit(0.0)).otherwise(
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") / nL)
    val lowered = transform(coalesce(ws, array().cast("array<string>")), t => lower(t))
    val stopHits = GopherStops
      .map(w => when(array_contains(lowered, w), 1).otherwise(0))
      .reduce(_ + _)
    repetition(df, contentCol, n = 2)
      .withColumn("n_words", nW)
      .withColumn("mean_word_len", meanLen)
      .withColumn("alpha_word_frac", alphaFrac)
      .withColumn("bullet_line_frac", bulletFrac)
      .withColumn("ellipsis_line_frac", ellipsisFrac)
      .withColumn("n_stop_hits", stopHits)
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("alpha_word_frac") >= minAlphaWordFrac &&
          col("bullet_line_frac") <= maxBulletLineFrac &&
          col("ellipsis_line_frac") <= maxEllipsisLineFrac &&
          col("n_stop_hits") >= minStopwordHits &&
          col("dup_line_frac") <= maxDupLineFrac &&
          col("top_ngram_frac") <= maxTopNgramFrac)
  }

  /** One PII pattern: a Java/RE2-compatible regex (the intersection dialect
    * — both Spark and DuckDB must run it for the oracle replay) and the
    * token that replaces each match.
    */
  final case class PiiPattern(name: String, regex: String, token: String)

  /** Default scrub set (CCNet/Dolma-style pretraining hygiene): emails,
    * IPv4 addresses, international phone numbers. Deliberately conservative
    * closed-form patterns — callers supply their own set for production
    * policies.
    */
  val DefaultPiiPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiPattern("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    PiiPattern("phone", "\\+\\d{9,15}", "<PHONE>")
  )

  /** PII scrubbing: per pattern, count matches in the ORIGINAL content
    * (`n_<name>` columns), then replace matches with the pattern's token,
    * applied in list order. Pure `regexp_extract_all`/`regexp_replace`
    * composition — a codegen'd scan, zero shuffle, embarrassingly parallel
    * at any scale.
    */
  def scrubPii(df: DataFrame, contentCol: String = "content",
               patterns: Seq[PiiPattern] = DefaultPiiPatterns): DataFrame = {
    val counted = patterns.foldLeft(df) { (acc, p) =>
      acc.withColumn(s"n_${p.name}",
        size(regexp_extract_all(col(contentCol), lit(p.regex), lit(0))).cast("long"))
    }
    val scrubbed = patterns.foldLeft(col(contentCol)) { (c, p) =>
      regexp_replace(c, p.regex, p.token)
    }
    counted.withColumn(contentCol, scrubbed)
  }

  /** C4/Gopher-style line-level boilerplate stripping: a line SURVIVES iff
    * its trimmed form has ≥ `minChars` characters AND ≥ `minAlphaRatio` of
    * them are ASCII letters — the classic nav-bar/menu/punctuation-run
    * filter of pretraining cleanups (C4 drops short and low-alpha lines;
    * Gopher §A1.1 uses the same family). Adds `content_clean` (surviving
    * lines re-joined; null content stays null), `n_lines_kept`, and
    * `n_lines_total`. Deliberately closed-form (trim + length + an
    * [^A-Za-z] strip) so the DuckDB oracle replays it exactly; the ratio
    * compare is integer-derived on both engines, so no float divergence.
    * Pure builtins — a codegen'd zero-shuffle scan.
    */
  def stripBoilerplate(df: DataFrame, contentCol: String = "content",
                       minChars: Int = 10,
                       minAlphaRatio: Double = 0.5): DataFrame = {
    val lines = split(col(contentCol), "\n")
    val kept = filter(lines, l => {
      val t = trim(l)
      val len = length(t)
      val alpha = length(regexp_replace(t, "[^A-Za-z]", ""))
      len >= minChars && alpha.cast("double") >= lit(minAlphaRatio) * len
    })
    df.withColumn("content_clean",
        when(col(contentCol).isNull, lit(null).cast("string"))
          .otherwise(array_join(kept, "\n")))
      .withColumn("n_lines_kept",
        when(col(contentCol).isNull, lit(0L)).otherwise(size(kept).cast("long")))
      .withColumn("n_lines_total",
        when(col(contentCol).isNull, lit(0L)).otherwise(size(lines).cast("long")))
  }

  /** CCNet-style perplexity quality signal (Wenzek et al. 2020) from a
    * unigram LM trained on the corpus itself — no external model needed.
    * Returns one row per doc: `id, n_tokens, nll, ppl` where `nll` is the
    * mean negative log-probability of the doc's tokens and `ppl = exp(nll)`.
    * High-ppl docs are the gibberish/boilerplate tail a pretraining filter
    * drops; low-ppl docs are the repetitive tail.
    *
    * The LM is additive-smoothed over the top-`vocabSize` tokens by corpus
    * frequency (ties broken by token text, so vocabulary selection is
    * deterministic): with `alpha = 1`,
    * `nll(tok) = ln(N + V + 1) − ln(cnt(tok) + 1)` where `N` is the corpus
    * token total, `V` the realized vocabulary size, and `cnt` is 0 for
    * out-of-vocabulary tokens — one closed form for both branches.
    *
    * Scale: vocabulary selection is one map-side-combined token agg +
    * a bounded TakeOrdered (never a full sort) with the ≤ `vocabSize`-row
    * result collected to the driver (bounded by contract, like the IVF
    * centroid table); scoring is a scan + explode + BROADCAST hash join
    * against the vocabulary + one skinny (id, partial-sum) shuffle — the
    * corpus content itself never crosses the wire.
    */
  def unigramNll(docs: DataFrame, vocabSize: Int = 50000,
                 idCol: String = "id",
                 contentCol: String = "content"): DataFrame = {
    require(vocabSize >= 1, "vocabSize >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextFunctions.tokens(col(contentCol))
    val counts = docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      val vocab = counts.orderBy(col("cnt").desc, col("tok").asc)
        .limit(vocabSize).as[(String, Long)].collect()
      val totalN = counts.agg(coalesce(sum(col("cnt")), lit(0L))).first().getLong(0)
      val lnDenom = math.log(totalN.toDouble + vocab.length + 1)
      val vocabDf = vocab.toSeq.toDF("tok", "cnt")
        .select(col("tok"), (lit(lnDenom) - log(col("cnt") + 1)).as("__nll_tok"))
      val perDoc = docs.select(col(idCol).as("id"), explode(toks).as("tok"))
        .join(broadcast(vocabDf), Seq("tok"), "left")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_tokens"),
          // OOV: cnt = 0 -> ln(0 + 1) = 0 -> nll_tok = lnDenom
          sum(coalesce(col("__nll_tok"), lit(lnDenom))).as("__s"))
      docs.select(col(idCol).as("id")).distinct()
        .join(perDoc, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("__s") / col("n_tokens"), lit(0.0)).as("nll"),
          coalesce(exp(col("__s") / col("n_tokens")), lit(1.0)).as("ppl"))
    } finally counts.unpersist()
  }

  /** Per-doc top-`k` terms by TF-IDF — the keyword/topic signal a curation
    * or clustering step reads per document. `tf` is the in-doc occurrence
    * count, `doc_freq` the number of docs containing the term, and
    * `score = tf · (ln((N+1)/(doc_freq+1)) + 1)` (smoothed idf — never
    * negative, so single-doc corpora still rank). `rank` is 1-based by
    * (score desc, token asc): the tie-break is the term text, so the cut is
    * deterministic.
    *
    * Scale: explode → ONE map-side-combined (id, token) agg; `doc_freq`
    * re-aggregates that already-skinny frame (not the raw occurrences); the
    * corpus doc count rides in as a broadcast scalar; the model join keys
    * on the token (vocabulary-sized, AQE-plannable). The per-doc rank
    * window filters `row_number() <= k`, which Spark ≥3.5 lowers to a
    * WindowGroupLimit map-side k-heap — ≤ k rows per (partition, doc)
    * reach the final shuffle.
    */
  def tfidf(df: DataFrame, k: Int = 3, idCol: String = "id",
            contentCol: String = "content"): DataFrame = {
    require(k >= 1, "k >= 1")
    val toks = TextFunctions.tokens(col(contentCol))
    val tf = df.select(col(idCol).as("id"), explode(toks).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.agg(count_distinct(col(idCol)).as("__n"))
    tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (log((col("__n") + lit(1.0)) / (col("doc_freq") + lit(1.0))) + lit(1.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("score").desc, col("tok").asc)))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank").cast("long").as("rank"), col("tok"),
        col("tf"), col("doc_freq"), col("score"))
  }

  /** Bigram-LM scoring — the context-sensitive upgrade of [[unigramNll]]
    * (the CCNet perplexity-filter family, with the honest closed-form LM a
    * corpus can train on itself): per doc, the mean negative log-probability
    * of its token bigrams under the corpus bigram model with add-1 smoothing
    * over the realized unigram vocabulary,
    * `nll(a b) = ln(c(a·) + V) − ln(c(a b) + 1)` where `c(a·)` is `a`'s
    * context count (occurrences followed by anything) and `V` the distinct
    * token count. Docs with < 2 tokens score `n_bigrams = 0, nll = 0,
    * ppl = 1`. Repetitive/templated text scores low, gibberish high —
    * filter both tails.
    *
    * Scale: bigram and context counts are map-side-combined aggs over the
    * exploded shingle stream; the per-gram nll model joins scoring rows on
    * the gram (vocabulary²-bounded, AQE-plannable — never broadcast by
    * assumption); `V` rides in as a broadcast scalar; the final per-doc agg
    * is one skinny (id, partial-sum) shuffle. Self-trained by contract, so
    * every scored gram hits the model (no OOV branch).
    */
  def bigramNll(docs: DataFrame, idCol: String = "id",
                contentCol: String = "content"): DataFrame = {
    val toks = TextFunctions.tokens(col(contentCol))
    val firstTok = (g: Column) => split(g, " ").getItem(0)
    val grams = docs.select(col(idCol).as("id"),
        explode(TextFunctions.shinglesAll(toks, 2)).as("g"))
    val cb = grams.groupBy(col("g")).agg(count(lit(1)).as("__cb"))
    val ca = grams.groupBy(firstTok(col("g")).as("a")).agg(count(lit(1)).as("__ca"))
    val vocab = docs.select(explode(toks).as("tok"))
      .agg(count_distinct(col("tok")).as("__v"))
    val model = cb.withColumn("a", firstTok(col("g")))
      .join(ca, Seq("a"))
      .crossJoin(broadcast(vocab))
      .select(col("g"),
        (log(col("__ca") + col("__v")) - log(col("__cb") + lit(1.0))).as("__nll"))
    val perDoc = grams.join(model, Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll")).as("__s"))
    docs.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("__s") / col("n_bigrams"), lit(0.0)).as("nll"),
        coalesce(exp(col("__s") / col("n_bigrams")), lit(1.0)).as("ppl"))
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm —
    * the guarantee-bearing upgrade of [[fingerprint]]'s single min-hash):
    * one row per selected (doc, gram position): `id, pos, fp` where `fp` is
    * the MD5 of the `k`-token gram at 0-based gram index `pos`, and a
    * position is selected iff it is the RIGHTMOST minimal hash of some
    * `w`-gram window. Any shared substring of ≥ `k + w − 1` tokens is
    * guaranteed to share a fingerprint — the local-dedup/plagiarism
    * candidate generator with a density bound of ~2/(w+1). Docs with < `k`
    * tokens emit nothing (too short to fingerprint); docs with fewer than
    * `w` grams use one whole-doc window.
    *
    * Scale: selection runs ENTIRELY inside the row — gram hashes, per-window
    * argmin, and cross-window dedup are array expressions over the doc's own
    * gram array (O(n·w) per doc, codegen'd), so the operator is a ZERO-
    * shuffle scan; only the selected ~2n/(w+1) fingerprint rows leave the
    * scan, and downstream bucket-joins group them by `fp`.
    */
  def winnowFingerprints(df: DataFrame, k: Int = 4, w: Int = 4,
                         idCol: String = "id",
                         contentCol: String = "content"): DataFrame = {
    require(k >= 1 && w >= 1, "k >= 1 && w >= 1")
    val hashes = transform(
      TextFunctions.shinglesAll(TextFunctions.tokens(col(contentCol)), k),
      g => md5(g))
    val hs = col("__hs")
    val n = size(hs)
    val wl = least(lit(w), n)
    // rightmost argmin of the window starting at gram i (0-based): reverse
    // the slice so the FIRST match array_position finds is the rightmost
    val selAt = (i: Column) => {
      val sl = slice(hs, i + 1, wl)
      i + wl - array_position(reverse(sl), array_min(sl))
    }
    df.select(col(idCol).as("id"), hashes.as("__hs"))
      .where(n >= 1)
      .select(col("id"), hs,
        explode(array_distinct(transform(sequence(lit(0), n - wl), selAt))).as("pos"))
      .select(col("id"), col("pos").cast("long").as("pos"),
        element_at(hs, (col("pos") + 1).cast("int")).as("fp"))
  }

  /** Adds `fingerprint`: min-MD5 over `n`-token windows (winnowing-style
    * content fingerprint — stable under small edits outside the minimal
    * window); docs shorter than `n` tokens hash their whole token stream.
    */
  def fingerprint(df: DataFrame, contentCol: String = "content",
                  n: Int = 8): DataFrame = {
    val toks = TextFunctions.tokens(col(contentCol))
    val sh = TextFunctions.shingles(toks, n)
    val fp = coalesce(
      array_min(transform(sh, g => md5(g))),
      md5(concat_ws(" ", toks)))
    df.withColumn("fingerprint", fp)
  }

  /** Per-group vocabulary cardinality, exact AND approximate — the
    * "how many distinct tokens does each source contribute" report that
    * sizes tokenizer training, vocab builds, and [[topTokens]] cuts.
    * `approx_distinct` is HyperLogLog++ at relative standard deviation
    * `rsd` — at 100 TB the exact arm (a distinct-shuffle of every (group,
    * token) pair) is the expensive one, and the sketch is the operator:
    * fixed ~kilobytes of state per group, map-side combined, mergeable
    * across partitions. The entry keeps both arms so the sketch stays
    * pinned against the exact count it approximates (|approx − exact| ≤
    * 5·rsd·exact gate — 5σ, deterministic for a fixed dataset since HLL++
    * is seedless).
    */
  def tokenCardinality(df: DataFrame, groupCol: String = "source",
                       contentCol: String = "content",
                       rsd: Double = 0.05): DataFrame =
    df.select(col(groupCol), explode(TextFunctions.tokens(col(contentCol))).as("tok"))
      .groupBy(col(groupCol))
      .agg(count_distinct(col("tok")).as("exact_distinct"),
        approx_count_distinct(col("tok"), rsd).as("approx_distinct"))

  /** Corpus-level per-key aggregation: doc count, char stats, token total.
    * One shuffle on the group key, map-side combined.
    */
  def corpusStats(df: DataFrame, groupCol: String, contentCol: String = "content",
                  charsCol: Option[String] = None): DataFrame = {
    val nChars = charsCol.map(col).getOrElse(length(col(contentCol)).cast("long"))
    df.select(col(groupCol), nChars.as("__nc"),
        size(TextFunctions.tokens(col(contentCol))).cast("long").as("__nt"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nc")).as("total_chars"),
        avg(col("__nc")).as("avg_chars"),
        sum(col("__nt")).as("total_tokens"))
  }

  /** Text normalization — the canonicalization pass a corpus runs before
    * hashing, deduplication, or tokenizer training, so that typographic
    * variants of the same text stop being "different" documents:
    *
    *  1. typographic punctuation → ASCII: curly single/double quotes and
    *     prime marks → `'`/`"`, en/em/horizontal-bar dashes and minus →
    *     `-`, NBSP / zero-width space → plain space, `…` → `...`;
    *  2. C0/C1 control characters stripped (tab and newline survive —
    *     they are structure, not noise);
    *  3. horizontal whitespace runs collapse to one space, spaces hugging
    *     a newline are dropped, 3+ consecutive newlines collapse to 2
    *     (paragraph break), and the ends are trimmed.
    *
    * Adds `content_norm` (null content stays null) and `changed`. The
    * rule set is deliberately closed-form — `translate`/`replace`/
    * `regexp_replace` builtins only — so the DuckDB oracle replays it
    * glyph-for-glyph and the output is engine-portable. A full Unicode
    * NFKC pass would need an ICU UDF; this is the pinned, cheaper subset
    * that covers the variants web corpora actually contain.
    *
    * Scale: a single codegen'd zero-shuffle scan, embarrassingly parallel.
    */
  /** Pairwise n-gram overlap between corpus groups (sources / languages /
    * snapshots) — the cross-source similarity & contamination matrix a
    * mixture designer reads next to [[corpusStats]]: for every unordered
    * group pair sharing at least one distinct word `n`-gram, the EXACT
    * Jaccard similarity of the two groups' distinct n-gram sets
    * (`group_a < group_b`, with intersection and both set sizes). INNER
    * semantics: fully-disjoint pairs are absent (their Jaccard is 0).
    *
    * Scale: never a pairwise set comparison. One distinct-(group, gram)
    * agg (map-side combined), then co-occurring pairs are generated FROM
    * EACH GRAM'S group set — `groupBy(gram).collect_set(group)` arrays are
    * bounded by #groups (a corpus has tens of sources, not millions), so
    * the pair explode is ≤ S²/2 rows per gram and the heavy shuffle key is
    * the gram, map-side combined again on (a, b). Set sizes ride in on a
    * broadcast join. With `hashGrams` (the default) the distinct/shuffle
    * key is the 64-bit xxhash of the gram instead of its text — 8-byte
    * keys at 100 TB; collisions only ever merge two grams (≈ n²/2⁶⁵ —
    * negligible bias, the standard sketch trade). The x42 oracle entry
    * runs `hashGrams = false` so the compare is exact-by-construction;
    * ExtSpec pins hashed ≡ exact on a fixture.
    */
  def groupOverlap(docs: DataFrame, groupCol: String = "source", n: Int = 3,
                   contentCol: String = "content",
                   hashGrams: Boolean = true): DataFrame = {
    require(n >= 1, "n >= 1")
    val gramTxt = explode(TextFunctions.shingles(TextFunctions.tokens(col(contentCol)), n))
    val gram = if (hashGrams) xxhash64(col("__gtxt")) else col("__gtxt")
    val grams = docs
      .select(col(groupCol).as("grp"), gramTxt.as("__gtxt"))
      .select(col("grp"), gram.as("gh"))
      .distinct()
    val sizes = grams.groupBy(col("grp")).agg(count(lit(1)).as("sz"))
    // ordered pairs out of each gram's (sorted, <= #groups) group set
    val pairs = grams.groupBy(col("gh"))
      .agg(sort_array(collect_set(col("grp"))).as("gs"))
      .select(explode(flatten(transform(col("gs"), (a, i) =>
        transform(slice(col("gs"), i + 2, size(col("gs"))), b =>
          struct(a.as("a"), b.as("b")))))).as("p"))
      .groupBy(col("p.a").as("group_a"), col("p.b").as("group_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("grp", "group_a")
        .withColumnRenamed("sz", "size_a")), Seq("group_a"))
      .join(broadcast(sizes.withColumnRenamed("grp", "group_b")
        .withColumnRenamed("sz", "size_b")), Seq("group_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")))
      .select(col("group_a"), col("group_b"), col("inter"),
        col("size_a"), col("size_b"), col("jaccard"))
  }

  /** 1:1 glyph folds for [[normalizeText]] (from/to, position-aligned):
    * curly quotes/primes \u2018\u2019\u201a\u2032 \u201c\u201d\u201e\u2033,
    * the dash family \u2013\u2014\u2015\u2212, and NBSP \u00a0. Shared with
    * the x39 oracle generator so both engines fold the identical alphabet.
    */
  private[graft] val NormFoldFrom: String =
    "\u2018\u2019\u201a\u2032\u201c\u201d\u201e\u2033\u2013\u2014\u2015\u2212\u00a0"
  private[graft] val NormFoldTo: String = "''''\"\"\"\"---- "

  def normalizeText(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val c0 = col(contentCol)
    val folded = translate(c0, NormFoldFrom, NormFoldTo)
    // ellipsis is 1 glyph -> 3 chars (translate can't grow), ZWSP deletes
    val ell = regexp_replace(regexp_replace(folded, "\u2026", "..."), "\u200b", "")
    val noCtl = regexp_replace(ell, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", "")
    val oneSpace = regexp_replace(noCtl, "[ \\t]+", " ")
    val tightNl = regexp_replace(oneSpace, " ?\\n ?", "\n")
    val paras = regexp_replace(tightNl, "\\n{3,}", "\n\n")
    val trimmed = trim(paras)
    df.withColumn("content_norm", trimmed)
      .withColumn("changed", coalesce(col("content_norm") =!= c0, lit(false)))
  }

  /** Per-group length-distribution quantiles, exact AND sketched — at
    * 100 TB the sketch IS the operator: `approx_percentile` keeps a bounded
    * mergeable KLL/GK-style summary per group (state ∝ accuracy, not rows)
    * where the exact arm must shuffle and sort every value. Both arms are
    * emitted so small-scale runs can verify the sketch before trusting it
    * at scale; the principled check is the RANK-ERROR bound (ε = 1/accuracy):
    * the sketched quantile at p must land between the EXACT quantiles at
    * p ± ε·slack. Output: one row per (group, p) with `q_exact`, `q_approx`,
    * and `approx_ok` (that bound).
    */
  def lengthQuantiles(df: DataFrame, groupCol: String,
                      contentCol: String = "content",
                      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                      accuracy: Int = 10000, slack: Double = 100.0): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "probs must be in [0, 1]")
    val eps = slack / accuracy
    def arr(ps: Seq[Double]) = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val lo = probs.map(p => math.max(0.0, p - eps))
    val hi = probs.map(p => math.min(1.0, p + eps))
    val agg = df
      .select(col(groupCol).as("g"), length(col(contentCol)).cast("long").as("__len"))
      .groupBy(col("g"))
      .agg(expr(s"percentile(__len, ${arr(probs)})").as("__ex"),
        expr(s"approx_percentile(__len, ${arr(probs)}, $accuracy)").as("__ap"),
        expr(s"percentile(__len, ${arr(lo)})").as("__lo"),
        expr(s"percentile(__len, ${arr(hi)})").as("__hi"))
    agg.select(col("g") +: probs.indices.map(i =>
        struct(lit(probs(i)).as("p"),
          element_at(col("__ex"), i + 1).as("q_exact"),
          element_at(col("__ap"), i + 1).cast("double").as("q_approx"),
          (element_at(col("__ap"), i + 1).cast("double")
            .between(element_at(col("__lo"), i + 1), element_at(col("__hi"), i + 1)))
            .as("approx_ok")).as(s"__s$i")): _*)
      .select(col("g"), explode(array(probs.indices.map(i => col(s"__s$i")): _*)).as("__q"))
      .select(col("g").as(groupCol), col("__q.p").as("p"),
        col("__q.q_exact").as("q_exact"), col("__q.q_approx").as("q_approx"),
        col("__q.approx_ok").as("approx_ok"))
  }

  /** Adds `token_entropy` — Shannon entropy (nats) of each doc's own
    * unigram distribution ([[graft.functions.TokenEntropy]]) — and
    * `norm_entropy` (entropy / ln(n_types), in [0,1]; 1 when ≤1 type).
    * Low values flag degenerate repetition the way [[repetition]]'s
    * top-n-gram fraction does, but in one closed-form number.
    *
    * Scale: computed entirely inside the row — a ZERO-shuffle codegen'd
    * scan over the corpus.
    */
  def tokenEntropy(df: DataFrame, contentCol: String = "content"): DataFrame = {
    // coalesce: null content -> null token array -> null expression output,
    // but the contract is "nothing to measure" = 0 (like the empty doc)
    val toks = TextFunctions.tokens(col(contentCol))
    val h = coalesce(TextFunctions.tokenEntropy(toks), lit(0.0))
    val types = coalesce(size(array_distinct(toks)), lit(0)).cast("double")
    df.withColumn("token_entropy", h)
      .withColumn("norm_entropy",
        when(types <= 1.0, lit(1.0)).otherwise(h / log(types)))
  }

  /** Lexical-diversity report per corpus group — the vocabulary-health
    * signals a mixture designer reads next to [[corpusStats]]: per group,
    * token and type (distinct-token) counts, type-token ratio, hapax ratio
    * (share of types occurring exactly once — low = templated/boilerplate
    * text), and the most-frequent token's share of all tokens (high = a
    * degenerate repeated token dominates the group). Tokenization is THE
    * shared [[graft.functions.TextFunctions.tokens]] definition.
    *
    * Scale: one map-side-combined (group, token) count agg — the same
    * skinny shuffle shape as [[tokenCardinality]]'s exact arm — then a
    * #types-row per-group roll-up; nothing corpus-sized crosses the wire
    * and no per-doc state survives the first aggregate.
    */
  def lexicalDiversity(df: DataFrame, groupCol: String,
                       contentCol: String = "content"): DataFrame = {
    val tok = df.select(col(groupCol).as("g"),
        explode(TextFunctions.tokens(col(contentCol))).as("t"))
      .groupBy(col("g"), col("t"))
      .agg(count(lit(1)).as("c"))
    tok.groupBy(col("g"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        max(col("c")).as("__top"))
      .select(col("g").as(groupCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_hapax").cast("double") / col("n_types")).as("hapax_ratio"),
        (col("__top").cast("double") / col("n_tokens")).as("top_token_share"))
  }

  /** Faceted corpus-composition report — the "what is in this corpus"
    * dashboard query: for each facet column, the top-`k` values by document
    * count with their corpus share, rank 1-based per facet by (count desc,
    * value asc — deterministic cut). NULL facet values count as a value of
    * their own (missing-metadata mass is part of composition). All facet
    * values compare as strings.
    *
    * Scale: ONE scan explodes rows into skinny (facet, value) pairs →
    * one map-side-combined count agg (cardinality Σ|facet domains|, tiny) →
    * the rank window runs over that aggregated frame, not over docs; the
    * total is a broadcast 1-row agg.
    */
  def facets(df: DataFrame, facetCols: Seq[String], k: Int = 20): DataFrame = {
    require(facetCols.nonEmpty, "facetCols must be non-empty")
    require(k >= 1, "k >= 1")
    val pairs = df.select(explode(array(facetCols.map(c =>
        struct(lit(c).as("facet"), col(c).cast("string").as("value"))): _*)).as("fv"))
      .select(col("fv.facet").as("facet"), col("fv.value").as("value"))
    val counts = pairs.groupBy(col("facet"), col("value"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = df.agg(count(lit(1)).cast("double").as("__tot"))
    counts
      // nulls LAST on the tie-break: Spark's bare asc is NULLS FIRST but
      // ANSI/DuckDB default ASC is NULLS LAST — pin the portable order
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("facet"))
          .orderBy(col("n_docs").desc, col("value").asc_nulls_last)))
      .filter(col("rank") <= k)
      .crossJoin(broadcast(tot))
      .select(col("facet"), col("value"), col("n_docs"),
        (col("n_docs") / col("__tot")).as("share"), col("rank"))
  }

  /** DSIR-style importance weight per raw-corpus document (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * `logratio(d) = (1/|d|) Σ_t [ln p_target(t) − ln p_raw(t)]` under two
    * add-one-smoothed unigram LMs — one trained on a small high-quality
    * `target` corpus, one on the `raw` corpus being selected from. Positive
    * means target-like; feeding `logratio` (or `exp` of it) into
    * [[Pipeline.sampleWeighted]] is the resampling step.
    *
    * The shared event space is the top-`vocabSize` RAW-corpus tokens
    * (count desc, token asc — a deterministic cut) plus one OOV bucket, so
    * both LMs are total over the same `V+1` events and every ratio is
    * finite: `p_C(t) = (cnt_C(t)+1) / (N_C + V + 1)`, OOV `cnt = 0`.
    * Empty/null docs score 0 with `n_tokens = 0`.
    *
    * Scale: the vocab is a bounded TakeOrdered collect (like
    * [[unigramNll]]); target counts fold onto it via a broadcast semi-join
    * so the ratio table stays O(vocabSize) end-to-end; scoring is ONE
    * per-doc token agg with the ratio table broadcast. Nothing
    * corpus-sized shuffles. At 100 TB pass `hashBuckets = Some(B)` —
    * DSIR's hashed features: tokens fold into `B` md5 buckets, the vocab
    * cut (and its collect) disappears, and both count aggs are ≤ B rows.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        vocabSize: Int = 50000,
                        hashBuckets: Option[Int] = None,
                        idCol: String = "id",
                        contentCol: String = "content"): DataFrame = {
    require(vocabSize >= 1, "vocabSize >= 1")
    hashBuckets.foreach(b => require(b >= 1, "hashBuckets >= 1"))
    val spark = raw.sparkSession
    import spark.implicits._
    // feature = token (exact mode) or hash bucket id (hashed mode). The
    // bucket fold is xxhash64 — codegen'd long arithmetic (the hashed arm
    // never faces a cross-engine oracle, so md5 portability is not required
    // of it) — and it is applied AFTER the explode, as a flat projection:
    // inside a `transform` lambda it would run interpreted per element
    // (Spark HOF lambdas don't codegen), measured ~4× the whole operator's
    // cost at 1M docs
    def featCol(t: Column): Column = hashBuckets match {
      case Some(b) => pmod(xxhash64(t), lit(b)).cast("string")
      case None => t
    }
    def counts(df: DataFrame): DataFrame =
      df.select(explode(TextFunctions.tokens(col(contentCol))).as("__t"))
        .select(featCol(col("__t")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // Re-spread the TARGET before counting: a target built with limit() or
    // a single-file read arrives as ONE partition, and its explode+count
    // then runs on one core — measured as the dominant operator cost at 1M
    // docs (4–6× the whole scoring pass). The target is small by contract
    // (the curated slice), so one round-robin shuffle of it is noise; the
    // RAW corpus is deliberately NOT respread (at 100 TB that shuffle is
    // the catastrophe this operator avoids).
    val parts = spark.sessionState.conf.numShufflePartitions
    val rawCnt = counts(raw).persist()
    val tgtAll = counts(target.repartition(parts)).persist()
    try {
      // vocab cut: hashed mode is already bounded by B, no cut needed
      val vocab = hashBuckets match {
        case Some(_) => rawCnt
        case None => rawCnt.orderBy(col("cnt").desc, col("tok").asc).limit(vocabSize)
      }
      val vocabRows = vocab.as[(String, Long)].collect()
      val nRaw = rawCnt.agg(coalesce(sum(col("cnt")), lit(0L))).first().getLong(0)
      val v = vocabRows.length
      val vocabDf = vocabRows.toSeq.toDF("tok", "raw_cnt")
      // fold target counts onto the bounded vocab: big side semi-filtered
      // by the broadcast vocab FIRST, so the outer join below is tiny⋈tiny
      val tgtOnVocab = tgtAll.join(broadcast(vocabDf.select("tok")), Seq("tok"), "left_semi")
        .withColumnRenamed("cnt", "tgt_cnt")
      val nTgt = tgtAll.agg(coalesce(sum(col("cnt")), lit(0L))).first().getLong(0)
      val lnDenomRaw = math.log(nRaw.toDouble + v + 1)
      val lnDenomTgt = math.log(nTgt.toDouble + v + 1)
      val ratioDf = vocabDf.join(tgtOnVocab, Seq("tok"), "left")
        .select(col("tok"),
          (log(coalesce(col("tgt_cnt"), lit(0L)) + 1) - lit(lnDenomTgt)
            - log(col("raw_cnt") + 1) + lit(lnDenomRaw)).as("__lr"))
      // OOV: both counts 0 -> ln(1)−lnDenomTgt − ln(1)+lnDenomRaw
      val oov = lnDenomRaw - lnDenomTgt
      val perDoc = raw
        .select(col(idCol).as("id"),
          explode(TextFunctions.tokens(col(contentCol))).as("__t"))
        .select(col("id"), featCol(col("__t")).as("tok"))
        .join(broadcast(ratioDf), Seq("tok"), "left")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("__lr"), lit(oov))).as("__s"))
      raw.select(col(idCol).as("id")).distinct()
        .join(perDoc, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("__s") / col("n_tokens"), lit(0.0)).as("logratio"))
    } finally { rawCnt.unpersist(); tgtAll.unpersist() }
  }

  /** Per-doc n-gram novelty: the fraction of a doc's DISTINCT word n-grams
    * occurring in NO other document (corpus df == 1), plus the mean corpus
    * df of its grams — the cross-doc uniqueness signal complementing X21's
    * within-doc repetition and X28's duplicated spans (boilerplate-heavy
    * docs score near 0, all-original docs near 1; mean_df grades HOW
    * shared the shared mass is). Docs with < n tokens have no grams:
    * novelty/mean_df NULL, n_grams 0. Output (id, n_grams, novelty,
    * mean_df).
    *
    * Scale: one exploded (gram, id) frame feeds a map-side-combined
    * gram-df aggregate; the skinny (gram, df) frame joins back on the
    * SAME gram partitioning (exchange reused) and one groupBy(id)
    * re-aggregates. Content never shuffles — only gram hashes and ids.
    */
  def noveltyScores(docs: DataFrame, idCol: String = "id",
                    contentCol: String = "content", n: Int = 3): DataFrame = {
    require(n >= 1, "n >= 1")
    val grams = docs.select(col(idCol).as("id"),
      explode(TextFunctions.shingles(
        TextFunctions.tokens(col(contentCol)), n)).as("__g"))
    val df = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val per = grams.join(df, Seq("__g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        avg((col("__df") === 1).cast("double")).as("novelty"),
        avg(col("__df").cast("double")).as("mean_df"))
    docs.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        col("novelty"), col("mean_df"))
  }

  /** Token-distribution drift between two corpus snapshots — the
    * training-data monitoring primitive ("did this week's crawl shift the
    * mixture, and which tokens moved"). Returns one row per token of the
    * MERGED per-side top-`vocabSize` vocabularies plus an `__oov` bucket
    * (each side's residual mass, so both probability columns sum to 1):
    * (token, p_a, p_b, shift, js_contrib), where `shift` = p_b − p_a and
    * `js_contrib` is the token's Jensen–Shannon divergence term
    * ½·p_a·ln(p_a/m) + ½·p_b·ln(p_b/m), m = (p_a+p_b)/2, with 0·ln0 = 0.
    * `sum(js_contrib)` over the frame is the corpus JS divergence (nats,
    * vocab-truncated). Vocab selection ties break (count desc, token asc) —
    * deterministic run-to-run.
    *
    * Scale: each side is ONE exploded-token count with map-side combine;
    * the global top-vocab truncation plans as TakeOrderedAndProject over
    * the already-aggregated (token, count) frame (vocab-bounded, not
    * corpus-bounded), and everything downstream runs on ≤ 2·vocabSize + 1
    * rows. The corpora are never joined row-to-row, and although each
    * side's count frame appears three times in the plan (top-vocab, lookup,
    * total), the subtrees are IDENTICAL, so ReuseExchange computes each
    * side's aggregation once (ExtSpec pins the ReusedExchange).
    */
  def tokenDistributionDrift(a: DataFrame, b: DataFrame, vocabSize: Int = 10000,
                             contentCol: String = "content"): DataFrame = {
    require(vocabSize >= 1, "vocabSize >= 1")
    def counts(df: DataFrame): DataFrame = df
      .select(explode(TextFunctions.tokens(col(contentCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val ca = counts(a)
    val cb = counts(b)
    def top(c: DataFrame): DataFrame = c
      .orderBy(col("cnt").desc, col("token").asc).limit(vocabSize).select("token")
    val vocab = top(ca).unionByName(top(cb)).distinct()
      // limit() collapses to one partition; respread the small frame so
      // the joins below don't serialize
      .repartition(a.sparkSession.sparkContext.defaultParallelism)
    val joined = vocab
      .join(ca, Seq("token"), "left").withColumnRenamed("cnt", "cnt_a")
      .join(cb, Seq("token"), "left").withColumnRenamed("cnt", "cnt_b")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val totals = ca.agg(sum(col("cnt")).as("tot_a"))
      .crossJoin(cb.agg(sum(col("cnt")).as("tot_b")))
      .select(coalesce(col("tot_a"), lit(0L)).as("tot_a"),
        coalesce(col("tot_b"), lit(0L)).as("tot_b"))
    val inVocab = joined.agg(sum(col("cnt_a")).as("iv_a"), sum(col("cnt_b")).as("iv_b"))
    val oov = totals.crossJoin(inVocab)
      .select(lit("__oov").as("token"),
        (col("tot_a") - coalesce(col("iv_a"), lit(0L))).as("cnt_a"),
        (col("tot_b") - coalesce(col("iv_b"), lit(0L))).as("cnt_b"))
    val withOov = joined.unionByName(oov).crossJoin(broadcast(totals))
    val pa = when(col("tot_a") > 0, col("cnt_a").cast("double") / col("tot_a"))
      .otherwise(lit(0.0))
    val pb = when(col("tot_b") > 0, col("cnt_b").cast("double") / col("tot_b"))
      .otherwise(lit(0.0))
    def term(p: Column, m: Column): Column =
      when(p > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0))
    withOov
      .withColumn("p_a", pa).withColumn("p_b", pb)
      .withColumn("__m", (col("p_a") + col("p_b")) / 2)
      .select(col("token"), col("p_a"), col("p_b"),
        (col("p_b") - col("p_a")).as("shift"),
        (term(col("p_a"), col("__m")) + term(col("p_b"), col("__m"))).as("js_contrib"))
  }

  /** Approximate token-frequency point queries via a count-min sketch —
    * the frequency complement of [[tokenCardinality]]'s HLL (how often is
    * this token, vs how many distinct tokens). Returns one row per probe:
    * (token, est_count, n_tokens), where est_count ≥ the true occurrence
    * count always, and ≤ true + eps·n_tokens with probability ≥
    * `confidence` (Cormode & Muthukrishnan 2005). The sketch is
    * deterministic given `seed`, so runs are reproducible.
    *
    * Scale: the sketch build is ONE pass over the exploded token column via
    * Spark's `count_min_sketch` TypedImperativeAggregate — partial sketches
    * merge map-side, so only depth×width counter blocks (≈100 KB at the
    * defaults) ever move, and the corpus is NEVER shuffled on token. The
    * single merged sketch row is collected (bounded by eps/confidence, not
    * by data) and the probes — a user-supplied handful — are estimated
    * driver-side against it.
    */
  def freqSketchProbe(docs: DataFrame, probes: Seq[String], eps: Double = 1e-3,
                      confidence: Double = 0.99, seed: Int = 42,
                      contentCol: String = "content"): DataFrame = {
    require(probes.nonEmpty, "at least one probe token")
    require(eps > 0 && eps < 1, "0 < eps < 1")
    val toks = docs.select(
      explode(TextFunctions.tokens(col(contentCol))).as("token"))
    val row = toks.agg(
      count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed)).as("cms"),
      count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    val spark = docs.sparkSession
    import spark.implicits._
    if (row.isNullAt(0)) return probes.map((_, 0L, 0L)).toDF("token", "est_count", "n_tokens")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      row.getAs[Array[Byte]](0))
    probes.map(p => (p, cms.estimateCount(p), n)).toDF("token", "est_count", "n_tokens")
  }

  /** Deflate compression ratio per document — the CCNet/Gopher-family
    * quality signal: templated or heavily repetitive text compresses far
    * below natural prose, while near-random text approaches (or with
    * header overhead slightly exceeds) 1. Output (id, n_bytes,
    * n_deflated, ratio) with ratio = deflated/raw over UTF-8 bytes
    * (level 6, raw deflate — no zlib header); empty docs report ratio 1.
    *
    * Scale: one zero-shuffle pass; `mapPartitions` with a single reused
    * Deflater per partition is the justified-imperative case — compression
    * is byte-level stateful work with no Catalyst builtin, and per-row
    * allocation of the native zlib state would dominate. Deterministic for
    * fixed input (single-shot deflate, fixed level/strategy).
    */
  def compressionRatio(docs: DataFrame, idCol: String = "id",
                       contentCol: String = "content"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("string").as("id"),
        coalesce(col(contentCol), lit("")).as("content"))
      .as[(String, String)]
      .mapPartitions { iter =>
        val deflater = new java.util.zip.Deflater(6, true)
        val buf = new Array[Byte](1 << 16)
        new Iterator[(String, Long, Long, Double)] {
          // end() when the task drains the iterator: the native zlib state
          // (~256 KB off-heap per Deflater) must not wait for GC on a
          // long-lived executor — that accumulates outside the heap with
          // no heap-pressure symptom
          private var ended = false
          def hasNext: Boolean = {
            val h = iter.hasNext
            if (!h && !ended) { ended = true; deflater.end() }
            h
          }
          def next(): (String, Long, Long, Double) = {
            val (id, content) = iter.next()
            val raw = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            if (raw.isEmpty) (id, 0L, 0L, 1.0)
            else {
              deflater.reset()
              deflater.setInput(raw)
              deflater.finish()
              var n = 0L
              while (!deflater.finished()) n += deflater.deflate(buf)
              (id, raw.length.toLong, n, n.toDouble / raw.length)
            }
          }
        }
      }
      .toDF("id", "n_bytes", "n_deflated", "ratio")
  }

  /** ONE-PASS quality-signal sweep: [[gopherFilter]] (incl. [[repetition]]),
    * [[quality]], [[langId]] and [[tokenCounts]] fused over a single scan,
    * plus the composite pretraining keep decision
    * `keep = gopher_keep AND quality >= minQuality AND pred_lang <> 'und'`
    * (the per-rule Gopher verdict survives as `gopher_keep`).
    *
    * Running the signals separately reads the corpus once PER FAMILY — at
    * 100 TB that is the difference between one scan and four. Because every
    * arm is closed-form column math on the content column, Catalyst
    * collapses the composition into one Project over one scan: ZERO
    * shuffle, zero joins, one WholeStageCodegen span (the plan-shape spec
    * pins this — the fusion, not the per-column math, is what this
    * operator adds; each arm's math is pinned by its own entry).
    */
  def signalSweep(df: DataFrame, contentCol: String = "content",
                  minQuality: Double = 0.25,
                  minWords: Long = 50, maxWords: Long = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  minAlphaWordFrac: Double = 0.8,
                  maxBulletLineFrac: Double = 0.9,
                  maxEllipsisLineFrac: Double = 0.3,
                  minStopwordHits: Int = 2,
                  maxDupLineFrac: Double = 0.3,
                  maxTopNgramFrac: Double = 0.2): DataFrame = {
    val g = gopherFilter(df, contentCol, minWords, maxWords,
        minMeanWordLen, maxMeanWordLen, minAlphaWordFrac, maxBulletLineFrac,
        maxEllipsisLineFrac, minStopwordHits, maxDupLineFrac, maxTopNgramFrac)
      .withColumnRenamed("keep", "gopher_keep")
    val annotated = tokenCounts(langId(quality(g, contentCol), contentCol),
      contentCol)
    annotated.withColumn("keep",
      col("gopher_keep") && col("quality") >= minQuality &&
        col("pred_lang") =!= "und")
  }

  /** Mojibake repair table: for each target char, the string produced by
    * writing its UTF-8 bytes and re-reading them as windows-1252 — the
    * single most common corpus corruption (UTF-8 text round-tripped
    * through a Latin-1/cp1252 system: "é" arrives as "Ã©", "’" as "â€™").
    * DERIVED, not hand-typed: the pairs are computed from the byte math
    * itself, restricted to targets whose mojibake form decodes to
    * printable cp1252 (bytes 0x81/8D/8F/90/9D have no glyph and surface
    * as control chars — those targets are excluded so the table stays
    * expressible as plain string literals in any engine). Sorted longest
    * mojibake first so 3-byte repairs run before their 2-byte suffixes
    * could misfire ("â€™" before "Â").
    */
  val MojibakeTable: Seq[(String, String)] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // targets = EVERY printable non-ASCII char cp1252 can produce (bytes
    // 0x80–0xFF; 0x81/8D/8F/90/9D are undefined and decode to controls).
    // Full closure matters: the intermediate chars of a DOUBLE-encoded
    // sequence ("é" → "Ã©" → "ÃƒÂ©") are themselves cp1252 output, so
    // with all of them in the table each fixMojibake pass peels exactly
    // one layer. Targets whose own UTF-8 bytes hit an undefined slot
    // (e.g. "”", third byte 0x9D) are excluded by the printability
    // filter — the table stays expressible as plain string literals.
    val targets = (0x80 to 0xFF)
      .map(b => new String(Array(b.toByte), cp1252).charAt(0))
      .filter(c => !c.isControl)
    targets.map { ch =>
      val moji = new String(
        ch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), cp1252)
      moji -> ch.toString
    }.filter { case (m, _) => m.forall(c => !c.isControl && c != '�') }
      .sortBy { case (m, _) => (-m.length, m) }
  }

  /** Repair UTF-8-as-cp1252 mojibake in `contentCol`: chained literal
    * replacements from [[MojibakeTable]], applied `passes` times (twice-
    * encoded text needs two passes). Adds `fixed` and `had_mojibake`.
    * Pure string-function column math — codegen'd, zero shuffle, and
    * exactly replayable as nested replace() calls in any SQL engine
    * (the oracle does precisely that). A fixed table is deliberately
    * dumber than ftfy's heuristics: deterministic output is worth more
    * than coverage of rare encodings in a 100 TB pipeline, where a
    * re-run must reproduce byte-identical shards.
    */
  def fixMojibake(df: DataFrame, contentCol: String = "content",
                  passes: Int = 1): DataFrame = {
    require(passes >= 1, s"passes must be >= 1, got $passes")
    val fixedOnce = (c: Column) => MojibakeTable.foldLeft(c) {
      case (acc, (moji, ch)) => replace(acc, lit(moji), lit(ch))
    }
    val fixed = (1 to passes).foldLeft(col(contentCol))((c, _) => fixedOnce(c))
    df.withColumn("fixed", fixed)
      .withColumn("had_mojibake", col("fixed") =!= col(contentCol))
  }
}
