package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-assembly operators for training-data pipelines: deterministic
  * stratified sampling, training-mixture weighting, concat-and-chunk
  * sequence packing, and benchmark decontamination. Selection everywhere is
  * driven by an ENGINE-PORTABLE hash (hex prefix of md5) rather than
  * `rand()`: runs are reproducible bit-for-bit across engines, retries, and
  * partitionings — the property a data pipeline needs for auditable corpus
  * composition (and what makes these operators oracle-checkable at all).
  */
object Pipeline {

  /** Uniform deterministic hash of a string column into [0, mod): the first
    * 12 hex digits of md5 (48 bits) reduced modulo `mod`. Portable: DuckDB
    * computes the identical value as `('0x' || substr(md5(x),1,12))::BIGINT
    * % mod`.
    */
  def md5Mod(c: Column, mod: Long): Column = {
    require(mod > 0, "mod > 0")
    pmod(conv(substring(md5(c), 1, 12), 16, 10).cast("long"), lit(mod))
  }

  private val Precision = 1000000L // sampling-fraction resolution: 1e-6

  /** Whitespace token count — THE definition shared by [[packSequences]],
    * [[mixCorpora]], and [[TextStats.lengthHistogram]] (and replayed by
    * the x18/x22/x32 DuckDB oracles), so cross-operator token accounting
    * can't silently diverge. Null content counts 0 EXPLICITLY: with
    * `spark.sql.legacy.sizeOfNull` (the non-ANSI default) `size(null)` is
    * -1, which would walk packing offsets backwards and deflate mixture
    * totals.
    */
  private[ext] def wsTokenCount(content: Column): Column =
    when(content.isNull, lit(0L)).otherwise(
      size(filter(split(content, "\\s+"), t => length(t) > 0)).cast("long"))

  /** Deterministic stratified sampling: keep a row iff
    * `md5Mod(id, 1e6) < fraction(stratum) * 1e6`. Per-stratum fractions come
    * from `fractions` (strata absent from the map use `defaultFraction`).
    *
    * Unlike `DataFrame.stat.sampleBy` (rand()-driven, partitioning-
    * dependent), membership is a pure function of the id — stable across
    * runs, engines, and retries, and the SAME rows stay selected when other
    * strata's fractions change (incremental corpus re-mixes don't churn).
    *
    * Scale: one codegen'd scan, zero shuffle; the fraction lookup compiles
    * to a bounded CASE chain (|fractions| is a user-supplied handful).
    */
  def sampleStratified(docs: DataFrame, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       idCol: String = "id"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val threshold = fractions.foldLeft(
      lit(math.round(defaultFraction * Precision))) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(math.round(f * Precision))).otherwise(acc)
    }
    docs.filter(md5Mod(col(idCol), Precision) < threshold)
  }

  /** Deterministic per-row WEIGHTED sampling: keep a row iff
    * `md5Mod(seed:id, 1e6) < clamp(weightCol, 0, 1) · 1e6` — quality-score-
    * proportional corpus selection (keep good docs with probability ≈ their
    * score), the continuous sibling of [[sampleStratified]]'s per-stratum
    * fractions. NULL weights keep nothing. Same determinism contract: a pure
    * function of (seed, id, weight), so membership is stable across runs,
    * engines, retries, and corpus growth, and re-running with a new seed is
    * an independent draw.
    *
    * Scale: one codegen'd zero-shuffle scan.
    */
  def sampleWeighted(docs: DataFrame, weightCol: String, seed: Long = 0L,
                     idCol: String = "id"): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    // explicit floor: Spark's double->long cast truncates but DuckDB's
    // rounds — floor() is the portable threshold both engines agree on
    docs.filter(
      md5Mod(concat_ws(":", lit(seed), col(idCol)), Precision) <
        floor(w * Precision).cast("long"))
  }

  /** EXACTLY-N-per-group deterministic sample: the k docs per group with the
    * smallest `md5(seed:id)` draw — the fixed-SIZE counterpart of
    * [[sampleStratified]]'s fixed-RATE draw ("500 eval docs per source",
    * not "0.1% of each source"). Pure function of (seed, id): stable across
    * runs/engines/retries, and monotone under growth — a new doc evicts at
    * most the current largest draw, never reshuffles the whole sample
    * (bounded churn, unlike re-running `ORDER BY rand() LIMIT N`).
    *
    * Scale: the rank-filtered window lowers to WindowGroupLimit map-side
    * k-heaps (the X41 plan shape — ≤ k rows per (partition, group) reach
    * the shuffle), never a per-group full sort.
    */
  def sampleFixedPerGroup(docs: DataFrame, groupCol: String, k: Int,
                          seed: Long = 0L, idCol: String = "id"): DataFrame = {
    require(k >= 1, "k >= 1")
    val draw = WorkingColumns.fresh(docs, "__draw")
    val rn = WorkingColumns.fresh(docs.withColumn(draw, lit("")), "__rn")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(draw), col(idCol))
    docs.withColumn(draw, md5(concat_ws(":", lit(seed.toString), col(idCol))))
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(draw, rn)
  }

  /** Greedy token-budget subsample — "give me ~N tokens per source", the
    * budget-shaped cousin of [[sampleStratified]]'s fraction-shaped draw:
    * docs are ordered per group by the deterministic draw `md5(seed:id)`
    * (so the selection is a pure function of (seed, id) — growth-stable
    * like [[splitCorpus]]: new docs sort into the stream without moving
    * already-drawn ones, and a doc's admission can only flip when enough
    * new docs hash BEFORE it to exhaust the budget first), and a doc is
    * kept iff the budget is not yet exhausted before it (`cum_tokens −
    * n_tokens < budgetTokens`) — the greedy fill admits one overshooting
    * doc rather than stopping short. Emits every doc with `n_tokens`
    * (the shared whitespace accounting definition), `cum_tokens`, and
    * `keep`, so the caller can audit the cut or `.filter(col("keep"))`.
    *
    * Scale: one hash shuffle on the group + a per-group sort feeding an
    * incrementally-evaluated running-sum frame — the same shape as
    * [[TextStats.lengthHistogram]]'s CDF but over docs; no global sort, no
    * driver state. Groups are sources/languages (tens-to-thousands), so
    * per-group window skew is the corpus's own source skew; salt upstream
    * only if one source dominates.
    */
  def budgetSample(docs: DataFrame, budgetTokens: Long,
                   groupCol: String = "source", idCol: String = "id",
                   contentCol: String = "content",
                   seed: Long = 0L): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens >= 0")
    val draw = md5(concat_ws(":", lit(seed.toString), col(idCol)))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__draw"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col(groupCol), col(idCol).as("id"),
        wsTokenCount(col(contentCol)).as("n_tokens"), draw.as("__draw"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("keep", col("cum_tokens") - col("n_tokens") < budgetTokens)
      .select(col(groupCol), col("id"), col("n_tokens"), col("cum_tokens"),
        col("keep"))
  }

  /** Concat-and-chunk sequence packing (the standard pretraining data-prep
    * step): docs are hash-sharded, each shard's docs are concatenated in id
    * order into one token stream, and the stream is cut every `budget`
    * tokens. Emits per doc: its shard, its token count, its start `offset`
    * in the shard stream, and `bin` = offset / budget — the chunk its first
    * token lands in (a doc may straddle into bin+1; the consumer crossing
    * chunk boundaries is exactly how concat-and-chunk training works).
    *
    * Scale: ONE shuffle into `shards` hash partitions + a per-shard sort;
    * the running-sum window is streaming (no buffering) and every shard
    * packs independently — parallelism is `shards`, pick it ≥ cluster
    * cores. Never a global order/window.
    *
    * Tokens = whitespace token count by default; pass `tokenCol` to pack by
    * a precomputed count (e.g. real BPE lengths from [[TextStats]]).
    */
  def packSequences(docs: DataFrame, budget: Long, shards: Int = 256,
                    idCol: String = "id", contentCol: String = "content",
                    tokenCol: Option[String] = None): DataFrame = {
    require(budget >= 1, "budget >= 1")
    require(shards >= 1, "shards >= 1")
    val nTokens = tokenCol.map(col).getOrElse(wsTokenCount(col(contentCol)))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("id"), nTokens.as("n_tokens"))
      .withColumn("shard", md5Mod(col("id"), shards).cast("int"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("offset") / budget).cast("long"))
  }

  /** Fixed-window token chunking with stride — the context-window prep step
    * that turns long documents into training examples (window `chunkSize`
    * whitespace tokens, advancing `stride` tokens per chunk; `stride <
    * chunkSize` yields the overlapping windows SFT/eval pipelines use).
    * Emits one row per (doc, chunk): `id, chunk_idx, chunk_start` (token
    * offset of the window), `n_chunk_tokens` (= chunkSize except on the last
    * window), and `chunk_text` (the window's tokens re-joined with single
    * spaces — whitespace is normalized, the one lossy step). A doc with
    * `n ≤ chunkSize` tokens emits exactly one chunk; an empty/null doc emits
    * none. The last window starts at the smallest stride multiple covering
    * the final token, so every token appears in ≥ 1 chunk and no window is
    * ever empty.
    *
    * Scale: a single codegen'd scan + explode — ZERO shuffle; each doc's
    * chunks are generated where the doc lives. Token definition is the
    * whitespace split shared with [[packSequences]]/[[mixCorpora]].
    */
  def chunkDocuments(docs: DataFrame, chunkSize: Int, stride: Int,
                     idCol: String = "id",
                     contentCol: String = "content"): DataFrame = {
    require(chunkSize >= 1, "chunkSize >= 1")
    require(stride >= 1 && stride <= chunkSize, "1 <= stride <= chunkSize")
    val toks = filter(split(col(contentCol), "\\s+"), t => length(t) > 0)
    docs.select(col(idCol).as("id"), toks.as("__toks"))
      .withColumn("__n",
        when(col("__toks").isNull, lit(0L)).otherwise(size(col("__toks")).cast("long")))
      // chunks = 1 + ceil((n - chunkSize) / stride) when n > chunkSize;
      // values are non-negative and < 2^53, so the double floor is exact
      .withColumn("__nchunks",
        when(col("__n") === 0, lit(0L))
          .when(col("__n") <= chunkSize, lit(1L))
          .otherwise(lit(1L) +
            floor((col("__n") - chunkSize + (stride - 1)) / lit(stride.toDouble)).cast("long")))
      // explode of the empty array drops token-less docs entirely
      .withColumn("chunk_idx",
        explode(when(col("__nchunks") === 0, array().cast("array<long>"))
          .otherwise(sequence(lit(0L), col("__nchunks") - 1))))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("n_chunk_tokens",
        least(lit(chunkSize.toLong), col("__n") - col("chunk_start")))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), (col("chunk_start") + 1).cast("int"),
          lit(chunkSize)), " "))
      .select(col("id"), col("chunk_idx"), col("chunk_start"),
        col("n_chunk_tokens"), col("chunk_text"))
  }

  /** Per-(shard, bin) packing summary: how full each chunk's doc-start set
    * is — the packing-efficiency view (docs whose start lands in the bin,
    * and their token mass; mass > budget means the tail spills into the
    * next chunk, mass < budget on a shard's last bin means padding).
    */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("token_mass"))
      .withColumn("fill", col("token_mass").cast("double") / budget)

  /** Deterministic named-split assignment (train/validation/test — the
    * holdout step every training-data pipeline runs before anything sees
    * the data): adds `split` = the first name whose cumulative
    * md5-threshold boundary exceeds md5Mod(seed:id, 1e6). Fractions must
    * sum to 1 (±1e-9); the last boundary is forced to the full range so
    * rounding can never orphan a doc.
    *
    * Membership is a pure function of (seed, id) — the [[sampleStratified]]
    * discipline: stable across runs, engines, and retries, and UNCHANGED
    * when the corpus grows (a doc ingested next month lands in a split
    * without moving anything already assigned — the property that keeps a
    * held-out test set honest). `seed` re-keys the whole assignment for an
    * independent draw.
    *
    * Scale: one codegen'd scan, ZERO shuffle; the assignment compiles to a
    * bounded CASE chain (|splits| is 2–4 in practice).
    */
  def splitCorpus(docs: DataFrame, splits: Seq[(String, Double)],
                  seed: Long = 0L, idCol: String = "id"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be unique")
    require(splits.forall(_._2 >= 0.0), "fractions must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    docs.withColumn("split", splitAssignment(col(idCol), splits, seed))
  }

  /** The deterministic split when-chain over an arbitrary KEY column —
    * shared by [[splitCorpus]] (key = the doc id) and [[splitByCluster]]
    * (key = the dup-cluster root). */
  private def splitAssignment(key: Column, splits: Seq[(String, Double)],
                              seed: Long): Column = {
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.min(Precision, math.round(c * Precision)))
    val h = md5Mod(concat_ws(":", lit(seed.toString), key), Precision)
    // first-match when-chain; the LAST split is the unconditional default
    // (its boundary is the full range by the sum-to-1 requirement)
    splits.map(_._1).zip(bounds).init
      .foldRight(lit(splits.last._1): Column) { case ((name, b), els) =>
        when(h < lit(b), lit(name)).otherwise(els)
      }
  }

  /** Leakage-safe [[splitCorpus]]: the assignment keys on the doc's
    * near-dup CLUSTER ROOT instead of its own id, so an exact-or-near
    * duplicate cluster can never straddle train/test — a test doc with a
    * train near-dup is eval leakage, which a plain per-id hash split
    * permits by construction. Docs in no cluster key on their own id.
    * Deterministic and rerun-stable like splitCorpus; fraction accuracy is
    * now per-CLUSTER (a huge cluster moves as one unit — the price of
    * leak-freedom).
    *
    * Scale: [[graft.ext.Dedup.corpusClusters]]'s capped candidate
    * machinery emits the skinny (id, cluster) map (clustered docs only);
    * one left join puts the root on each doc and the assignment is the
    * same codegen'd md5 threshold as splitCorpus.
    */
  def splitByCluster(docs: DataFrame, splits: Seq[(String, Double)],
                     seed: Long = 0L, idCol: String = "id",
                     contentCol: String = "content",
                     threshold: Double = 0.8): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be unique")
    require(splits.forall(_._2 >= 0.0), "fractions must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val clusters = graft.ext.Dedup.corpusClusters(docs, idCol, contentCol,
      threshold = threshold)
    val root = WorkingColumns.fresh(docs, "__root")
    val cl = WorkingColumns.fresh(docs, "__cl")
    docs
      .join(clusters.select(col("id").as(idCol), col("cluster").as(cl)),
        Seq(idCol), "left")
      .withColumn(root, coalesce(col(cl), col(idCol)))
      .withColumn("split", splitAssignment(col(root), splits, seed))
      .drop(cl, root)
  }

  /** Deterministic global shuffle into numbered training shards — the
    * "shuffle the corpus before the dataloader sees it" step. Adds
    * `shard` = md5Mod(seed:id, numShards) and `pos` = the row's 0-based
    * rank within its shard, ordered by the full md5 digest of (seed:id)
    * (id tiebreak) — so the within-shard order is itself pseudo-random,
    * reproducible bit-for-bit across runs/engines/retries (unlike
    * `DataFrame.orderBy(rand())`), and re-keyable by changing `seed`
    * (epoch number → fresh permutation, nothing else recomputed).
    *
    * Scale: ONE hash shuffle into `numShards` partitions + a per-shard
    * sort — never a global order. Parallelism is `numShards`; pick it ≥
    * cluster cores (the [[packSequences]] discipline). All input columns
    * ride along — this op IS the shuffle writer, the payload has to move
    * exactly once.
    */
  def shuffleShards(docs: DataFrame, numShards: Int, seed: Long = 0L,
                    idCol: String = "id"): DataFrame = {
    require(numShards >= 1, "numShards >= 1")
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol)))
    // the rank key rides on the caller's frame — collision-free name
    val rk = WorkingColumns.fresh(docs, "__rk")
    val w = Window.partitionBy(col("shard")).orderBy(col(rk), col(idCol))
    docs
      .withColumn(rk, key)
      .withColumn("shard",
        pmod(conv(substring(col(rk), 1, 12), 16, 10).cast("long"),
          lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop(rk)
  }

  /** Mixture weighting: downsample each source so the kept corpus
    * approaches `budgetTokens` total whitespace tokens split per `weights`
    * (the training-mixture spec: "X% web, Y% code, …"). Each source's keep
    * fraction is `min(1, weight × budget / sourceTokens)` — an
    * under-weight source saturates at keeping everything (no upsampling;
    * oversample by unioning the output with itself if repetition is
    * wanted). Selection reuses [[sampleStratified]]'s md5-threshold
    * membership, so the mix is deterministic and re-mixing one source
    * never churns another's kept set.
    *
    * Scale: one map-side-combined agg for the per-source token totals
    * (#sources rows to the driver — a mixture spec is a handful), then the
    * zero-shuffle sampling scan.
    */
  def mixCorpora(docs: DataFrame, sourceCol: String,
                 weights: Map[String, Double], budgetTokens: Long,
                 idCol: String = "id",
                 contentCol: String = "content"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ >= 0.0), "weights must be >= 0")
    require(budgetTokens >= 0, "budgetTokens >= 0")
    val totals = docs.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(sum(wsTokenCount(col(contentCol))).as("tok"))
      // a source whose every doc has null content sums to NULL -> 0 tokens
      // (getLong on the null would crash the driver)
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val fractions = weights.map { case (s, w) =>
      val tok = totals.getOrElse(s, 0L)
      s -> (if (tok == 0L) 0.0 else math.min(1.0, w * budgetTokens / tok))
    }
    sampleStratified(docs.filter(col(sourceCol).isin(weights.keys.toSeq: _*)),
      sourceCol, fractions, defaultFraction = 0.0, idCol)
  }

  /** Per-group top-k selection — "keep the k best docs per source/language/
    * domain", the curation step between scoring ([[TextStats.quality]],
    * perplexity) and mixing ([[mixCorpora]]). Keeps the `k` highest rows of
    * each `groupCol` group by `scoreCol` (descending), with `idCol` as the
    * ascending tie-break so the cut is deterministic; adds `rank` (1-based
    * within the group).
    *
    * Scale: expressed as a rank-filtered window ON PURPOSE — since 3.5,
    * Spark lowers `row_number() <= k` into a WindowGroupLimit physical
    * node that keeps a bounded k-heap per group on the MAP side, so only
    * ≤ k rows per (partition, group) ever reach the shuffle; the plan
    * never buffers or sorts a whole group's docs. ExtSpec pins the
    * WindowGroupLimit node so a conf/regression that silently degrades to
    * the full window sort fails the suite.
    */
  def topKPerGroup(docs: DataFrame, groupCol: String, scoreCol: String,
                   k: Int, idCol: String = "id"): DataFrame = {
    require(k >= 1, "k >= 1")
    val rn = WorkingColumns.fresh(docs, "__rn")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    docs.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .withColumn("rank", col(rn).cast("long"))
      .drop(rn)
  }

  /** Benchmark decontamination, candidate view: (id, bench_id, hits) for
    * every (training doc, benchmark doc) pair sharing ≥ 1 distinct word
    * `n`-gram — the standard eval-set-leakage check a pretraining corpus
    * runs before training.
    *
    * Scale shape: the benchmark side is an eval set — SMALL by definition —
    * so its exploded (gram, bench_id) frame is broadcast; the corpus side
    * is a single scan + shingle explode + broadcast hash join + one groupBy
    * over the (rare) matching pairs. The 100 TB corpus is never shuffled.
    */
  def contaminationHits(docs: DataFrame, bench: DataFrame, n: Int = 8,
                        idCol: String = "id", contentCol: String = "content",
                        benchIdCol: String = "id",
                        benchContentCol: String = "content"): DataFrame = {
    import graft.functions.TextFunctions
    val docGrams = docs.select(col(idCol).as("id"),
      explode(TextFunctions.shingles(TextFunctions.tokens(col(contentCol)), n)).as("gram"))
    val benchGrams = bench.select(col(benchIdCol).as("bench_id"),
      explode(TextFunctions.shingles(TextFunctions.tokens(col(benchContentCol)), n)).as("gram"))
      .distinct()
    docGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("hits"))
  }

  /** Drop every doc with ≥ `minHits` shared distinct `n`-grams against ANY
    * single benchmark doc (per-pair threshold — one strong overlap flags the
    * doc even if other benchmark docs contribute nothing).
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, n: Int = 8,
                    minHits: Long = 1, idCol: String = "id",
                    contentCol: String = "content",
                    benchIdCol: String = "id",
                    benchContentCol: String = "content"): DataFrame = {
    val flagged = contaminationHits(docs, bench, n, idCol, contentCol,
        benchIdCol, benchContentCol)
      .filter(col("hits") >= minHits)
      // no distinct: left_anti ignores duplicate right-side keys, and the
      // extra exchange+aggregate over the flagged set buys nothing
      .select(col("id").as(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Mean-pool chunk embeddings into one document embedding — the standard
    * long-document embedding recipe (embed fixed-window chunks, average,
    * optionally L2-normalize so downstream cosine ranking treats pooled and
    * directly-embedded docs alike).
    *
    * Powered by [[graft.functions.VectorAgg.vectorSum]], a typed aggregate
    * carrying ONE dim-length double buffer per group through a single
    * map-side-combined shuffle — the compositional alternative (posexplode →
    * groupBy(id, pos) → re-assemble) would shuffle dim× the rows twice.
    * NULL-embedding chunks are ignored; all-NULL docs drop (there is nothing
    * to pool). Output: (`idCol`, `n_chunks`, `embedding` ARRAY<DOUBLE>).
    */
  def poolEmbeddings(chunks: DataFrame, idCol: String = "id",
                     embCol: String = "embedding",
                     normalize: Boolean = true): DataFrame = {
    val pooled = chunks
      .groupBy(col(idCol))
      .agg(graft.functions.VectorAgg.vectorSum(col(embCol)).as("__sum"),
        count(col(embCol)).as("n_chunks"))
      .filter(col("__sum").isNotNull)
    val mean = transform(col("__sum"), x => x / col("n_chunks"))
    val emb =
      if (!normalize) mean
      else {
        val norm = sqrt(aggregate(mean, lit(0.0), (acc, x) => acc + x * x))
        // zero vector stays zero rather than NaN-ing the whole embedding
        when(norm === 0.0, mean).otherwise(transform(mean, x => x / norm))
      }
    pooled.select(col(idCol), col("n_chunks"), emb.as("embedding"))
  }

  /** Key-skew diagnostics: the k heaviest values of a prospective
    * shuffle/join key with their row share and skew factor
    * (count / mean-count — how many reducers' fair share the key hogs).
    * The report that decides whether a key needs [[graft.ext.Joins.saltedJoin]]
    * or AQE skew handling BEFORE the job ships, instead of discovering a
    * straggler at hour three.
    *
    * Scale: one map-side-combined key count, a 3-scalar roll-up riding a
    * broadcast, and a bounded TakeOrdered top-k — never a full sort.
    */
  def keySkewStats(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, "k >= 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.orderBy(col("cnt").desc, col(keyCol).asc).limit(k)
      .crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col(keyCol).asc)).cast("long"))
      .select(col("rank"), col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("__total")).as("share"),
        (col("cnt").cast("double") * col("__nkeys") / col("__total")).as("skew"))
  }

  /** Pairwise cosine similarity of per-group MEAN embeddings — the
    * source-similarity map in embedding space (which corpora cover the same
    * semantic territory; read next to the X42 n-gram overlap matrix, which
    * sees lexical overlap only). Unordered pairs (`g_a < g_b`), plus each
    * group's chunk count.
    *
    * Scale: the centroid pass is [[poolEmbeddings]]'s single skinny
    * map-side-combined shuffle keyed by group; the pair join runs over
    * #groups rows (tens of sources), bounded by construction. Cosine runs
    * in double over the double means (the codegen'd float expression would
    * silently round the centroids).
    */
  def centroidSimilarity(chunks: DataFrame, groupCol: String,
                         embCol: String = "embedding"): DataFrame = {
    val cent = poolEmbeddings(chunks, idCol = groupCol, embCol = embCol,
        normalize = false)
      .select(col(groupCol).as("__g"), col("n_chunks").as("__n"),
        col("embedding").as("__e"))
    val a = cent.select(col("__g").as("g_a"), col("__n").as("n_a"), col("__e").as("__ea"))
    val b = cent.select(col("__g").as("g_b"), col("__n").as("n_b"), col("__e").as("__eb"))
    a.join(b, col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        graft.functions.VectorFunctions.cosineHof(col("__ea"), col("__eb")).as("sim"))
  }

  /** Z-order (Morton) interleave key over `cols` — the multi-column
    * data-skipping layout key (the OPTIMIZE ZORDER of Delta/Iceberg,
    * re-expressed as a plain deterministic expression): each column is
    * scaled to `bits` integer buckets over its caller-supplied [min, max]
    * (explicit bounds keep the key a pure function — reproducible across
    * runs, engines, and appends), then bucket bits interleave so that rows
    * close in EVERY dimension get close keys. Range-partitioning + sorting
    * by this key clusters each output file into a small hyper-rectangle of
    * the value space, so min/max file stats prune multi-column predicates
    * — the layout half of predicate pushdown at 100 TB.
    *
    * Pure integer arithmetic (`(c−min)·(2^bits−1) / (max−min)`, clamped),
    * so an independent SQL engine replays the key bit-for-bit. Overflow
    * bound: (max−min)·(2^bits−1) must fit a signed 64-bit — at the default
    * 16 bits that allows column ranges up to ~1.4e14.
    */
  def zorderKey(cols: Seq[(Column, (Long, Long))], bits: Int = 16): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits >= 1 && bits * cols.size <= 63, "bits * cols must fit a signed long")
    val d = cols.size
    val maxBucket = (1L << bits) - 1
    // EXACT integer division (Catalyst IntegralDivide), not `/`: double
    // division loses ulps above 2^53 and the bucket then disagrees with an
    // integer-arithmetic replay in another engine
    def idiv(a: Column, b: Long): Column =
      org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.Bridge.expression(a),
          org.apache.spark.sql.graftbridge.Bridge.expression(lit(b))))
    val scaled = cols.map { case (c, (lo, hi)) =>
      require(hi > lo, s"max must exceed min ($lo, $hi)")
      least(greatest(
        idiv((c.cast("long") - lo) * maxBucket, hi - lo), lit(0L)), lit(maxBucket))
    }
    (0 until bits).flatMap(j => scaled.zipWithIndex.map { case (x, i) =>
      shiftleft(shiftright(x, j).bitwiseAND(1L), j * d + i)
    }).reduce(_.bitwiseOR(_))
  }

  /** Materialize `df` at `path` Z-ordered on `cols`: one pass computes each
    * column's [min, max], the Morton key range-partitions the frame into
    * `files` clustered parquet files (sorted within, so row groups nest the
    * clustering). Returns the bounds used, for replaying [[zorderKey]] at
    * read/audit time.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int = 64, bits: Int = 16): Map[String, (Long, Long)] = {
    require(cols.nonEmpty, "at least one column")
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val agg = df.agg(aggCols.head, aggCols.tail: _*).head()
    val bounds = cols.zipWithIndex.map { case (c, i) =>
      c -> (agg.getLong(2 * i), agg.getLong(2 * i + 1) + 1)
    }.toMap
    val key = zorderKey(cols.map(c => (col(c), bounds(c))), bits)
    val zc = WorkingColumns.fresh(df, "__z")
    df.withColumn(zc, key)
      .repartitionByRange(files, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write.mode("overwrite").parquet(path)
    bounds
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): replace ~`density`
    * of each doc's tokens with sentinel-marked masked spans, emitting the
    * (input, target) pretraining pair. Fully DETERMINISTIC, unlike T5's
    * sampled spans: token `i` STARTS a span iff
    * `md5Mod(seed:id:i, 1e6) < density/spanLen·1e6` (so the expected masked
    * fraction is `density`), a start masks the FIXED window `[i, i+spanLen)`,
    * and overlapping/adjacent windows merge into one run. Run `k` (0-based,
    * left to right) appears in the input as `<extra_id_k>` replacing its
    * tokens, and in the target as `<extra_id_k>` followed by those tokens;
    * no trailing EOS sentinel is emitted (divergence from strict T5,
    * documented). Determinism makes the pair reproducible across runs,
    * engines, and retries — the oracle replays start/merge/rebuild exactly.
    *
    * Output: (id, input, target, n_spans, n_masked); un-masked docs get
    * their plain token join with empty target, empty docs both empty.
    *
    * Scale: posexplode → ONE hash shuffle on id for the window stack
    * (start→mask→run-index are three chained windows over the same
    * (id, pos) ordering — one WindowExec pass) → one groupBy(id)
    * reassembly via the sorted-struct collect idiom ([[graft.ext.Dedup]]'s
    * line rebuild). Per-doc state is O(doc tokens); nothing global.
    */
  def spanCorrupt(docs: DataFrame, density: Double = 0.15, spanLen: Int = 3,
                  seed: Long = 0L, idCol: String = "id",
                  contentCol: String = "content"): DataFrame = {
    require(density > 0.0 && density <= 1.0, "density in (0, 1]")
    require(spanLen >= 1, "spanLen >= 1")
    val startP = math.round(density / spanLen * Precision)
    val toks = graft.functions.TextFunctions.tokens(col(contentCol))
    val tok = docs.select(col(idCol).as("id"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("__st",
        md5Mod(concat_ws(":", lit(seed), col("id"), col("pos")), Precision) < startP)
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val staged = tok
      .withColumn("__m",
        max(col("__st").cast("int")).over(w.rowsBetween(-(spanLen - 1), 0)) === 1)
      .withColumn("__nw", col("__m") && !coalesce(lag(col("__m"), 1).over(w), lit(false)))
      .withColumn("__run",
        sum(col("__nw").cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    val sentinel = concat(lit("<extra_id_"), col("__run"), lit(">"))
    def rebuild(df: DataFrame, piece: Column, outCol: String) =
      df.select(col("id"), col("pos"), piece.as("__p"))
        .groupBy(col("id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__p")))),
          s => s.getField("__p")), " ").as(outCol))
    val inp = rebuild(staged.filter(!col("__m") || col("__nw")),
      when(col("__m"), sentinel).otherwise(col("tok")), "input")
    val tgt = rebuild(staged.filter(col("__m")),
      when(col("__nw"), concat(sentinel, lit(" "), col("tok"))).otherwise(col("tok")), "target")
    val stats = staged.groupBy(col("id"))
      .agg(sum(col("__nw").cast("long")).as("n_spans"),
        sum(col("__m").cast("long")).as("n_masked"))
    docs.select(col(idCol).as("id")).distinct()
      .join(inp, Seq("id"), "left")
      .join(tgt, Seq("id"), "left")
      .join(stats, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("input"), lit("")).as("input"),
        coalesce(col("target"), lit("")).as("target"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
  }
}
