package graft.ext

import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (new-scope per BASELINE.json; the reference has no dedup surface — its
  * tokenizer, src/sifts/core.py:461, is the shared substrate).
  *
  * Every operator is candidate-generation-then-verify: candidates come from
  * an equality join on a bucket key (exact hash / LSH band / shared shingle /
  * SimHash chunk), NEVER from an all-pairs comparison — the only O(N²) work
  * is inside a bucket. That is the 100 TB design constraint.
  */
object Dedup {

  // -------------------------------------------------------------------------
  // Exact duplicates
  // -------------------------------------------------------------------------

  /** Exact-duplicate pairs: (keep_id, dup_id) where keep_id is the smallest
    * id of each identical-content group. groupBy on a 256-bit content hash —
    * one shuffle keyed on the hash, map-side combined; collision-free for any
    * realistic corpus.
    */
  def exactDupPairs(docs: DataFrame, idCol: String = "id",
                    contentCol: String = "content"): DataFrame = {
    val grouped = docs
      .select(col(idCol).as("id"), sha2(col(contentCol), 256).as("__h"))
      .groupBy(col("__h"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    grouped
      .select(element_at(col("ids"), 1).as("keep_id"),
        explode(slice(col("ids"), 2, Int.MaxValue)).as("dup_id"))
  }

  /** The deduplicated corpus: one representative (smallest id) per
    * identical-content group, all other columns preserved.
    */
  def dropExactDups(docs: DataFrame, idCol: String = "id",
                    contentCol: String = "content"): DataFrame = {
    val dups = exactDupPairs(docs, idCol, contentCol).select(col("dup_id").as(idCol))
    docs.join(dups, Seq(idCol), "left_anti")
  }

  /** Drops the HIGHER-id side of every near-duplicate pair (the standard
    * cheap policy; a doc that is id_b in any pair goes). Pass any pair frame
    * from the near-dup detectors. Not transitively minimal — for strict
    * cluster-level dedup run connected components over the pair graph.
    */
  def dropNearDups(docs: DataFrame, pairs: DataFrame,
                   idCol: String = "id"): DataFrame =
    docs.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  // -------------------------------------------------------------------------
  // MinHash + LSH near-duplicates
  // -------------------------------------------------------------------------

  /** (id, shingles, sig) for every doc: word `n`-gram shingles and a
    * `bands*rowsPerBand`-perm MinHash signature. Pure scan, zero shuffle.
    */
  private def signatures(docs: DataFrame, idCol: String, contentCol: String,
                         n: Int, numHashes: Int): DataFrame =
    docs.select(
      col(idCol).as("id"),
      TextFunctions.shingles(TextFunctions.tokens(col(contentCol)), n).as("sh"))
      .withColumn("sig", HashFunctions.minHashSignature(col("sh"), numHashes))

  /** LSH candidate pairs (id_a < id_b, distinct): docs agreeing on ALL
    * `rowsPerBand` signature rows of at least one band. One shuffle on
    * (band index, band hash); bucket-local self-join.
    */
  private def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandHashes = transform(
      sequence(lit(0), lit(bands - 1)),
      j => xxhash64(concat_ws(",", slice(col("sig"), j * rowsPerBand + 1, lit(rowsPerBand))), j))
    val banded = sigs
      .select(col("id"), posexplode(bandHashes).as(Seq("band", "bh")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs by word-shingle Jaccard ≥ `threshold`, found with
    * MinHash LSH and VERIFIED with the exact Jaccard (no false positives;
    * recall governed by the band shape: P[miss] = (1 − t^r)^b — for the
    * default 32×4 at t=0.8 that is < 1e-7).
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashDupPairs(docs: DataFrame, idCol: String = "id",
                      contentCol: String = "content", n: Int = 3,
                      bands: Int = 32, rowsPerBand: Int = 4,
                      threshold: Double = 0.8): DataFrame = {
    val sigs = signatures(docs, idCol, contentCol, n, bands * rowsPerBand)
    val candidates = lshCandidates(sigs.select("id", "sig"), bands, rowsPerBand)
    // Verification recomputes shingles only (cheap scan) — keeping `sig` out
    // of these branches keeps the 128-perm signature expression in exactly
    // one subtree (the banded self-join, whose identical shuffle sides
    // collapse into a ReusedExchange).
    val sh = docs.select(
      col(idCol).as("id"),
      TextFunctions.shingles(TextFunctions.tokens(col(contentCol)), n).as("sh"))
    verifyJaccard(candidates, sh, threshold)
  }

  // -------------------------------------------------------------------------
  // Exact n-gram Jaccard (no LSH — inverted-index candidates)
  // -------------------------------------------------------------------------

  /** EXACT near-duplicate pairs by word-shingle Jaccard ≥ `threshold`,
    * via PREFIX FILTERING (the PPJoin-family set-similarity join):
    *
    * Order every doc's shingles by ascending global document frequency; a
    * pair with Jaccard ≥ t MUST share a shingle inside each doc's first
    * ⌊(1−t)·|A|⌋+1 shingles of that ordering (if the prefixes were disjoint,
    * the overlap is bounded below t·|A∪B|). Candidates therefore come only
    * from the RAREST ~(1−t) fraction of each doc's shingles — hot shingles
    * never generate pairs — and are verified with the full exact Jaccard.
    * Recall stays 1 by the prefix-filter theorem; the naive shared-ANY-
    * shingle join (f² rows for a shingle in f docs) is what this replaces.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "id",
                        contentCol: String = "content", n: Int = 3,
                        threshold: Double = 0.8,
                        dfOrdered: Boolean = false): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      TextFunctions.shingles(TextFunctions.tokens(col(contentCol)), n).as("sh"))
    // Prefix length floor((1-t)*sz) + 1, with an epsilon: (1.0 - t) is not
    // exact in binary and floor((1-t)*sz) can land one BELOW the true value
    // exactly when (1-t)*sz is integral — a one-short prefix silently drops
    // qualifying pairs (observed: 255 vs 256 pairs at t=0.8).
    val prefLen = (floor((lit(1.0) - threshold) * size(col("sh")) + lit(1e-9)) + 1).cast("int")
    val prefix =
      if (dfOrdered) {
        // rarest-first global order: fewest candidates (the PPJoin choice),
        // at the cost of a document-frequency join + per-doc window.
        val inv = sh.select(col("id"), explode(col("sh")).as("g"))
        val dfreq = inv.groupBy(col("g")).agg(count(lit(1)).as("df"))
        inv.join(dfreq, "g")
          .withColumn("pos", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("id")).orderBy(col("df"), col("g"))))
          .join(sh.select(col("id"), prefLen.as("p")), "id")
          .filter(col("pos") <= col("p"))
          .select(col("id"), col("g"))
      } else {
        // hash global order: the prefix is computed INSIDE the row (native
        // HashPrefix expression) — zero shuffles before the candidate join.
        // Any global total order preserves the theorem.
        sh.select(col("id"),
          explode(HashFunctions.hashPrefix(col("sh"), threshold)).as("g"))
      }
    val candidates = prefix.as("a")
      .join(prefix.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(candidates, sh, threshold)
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against the
    * (id, sh) shingle frame.
    */
  private def verifyJaccard(candidates: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame =
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", TextFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  // -------------------------------------------------------------------------
  // Duplicate clustering
  // -------------------------------------------------------------------------

  /** Connected components over a near-duplicate pair graph: (id, cluster)
    * where cluster = the smallest id reachable from `id` (only ids that
    * appear in a pair are returned). Iterative min-label propagation over
    * DataFrames — each round joins the current labels across the edge list
    * and keeps the smaller label, until a fixpoint; rounds needed =
    * O(graph diameter), which for near-dup graphs is tiny. Strictly
    * cluster-minimal, unlike the greedy `dropNearDups`.
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .persist()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate label for dst = min over neighbors' labels (and own)
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("cluster"))
      val next = labels.unionByName(viaEdges)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
        .persist()
      changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels
  }

  // -------------------------------------------------------------------------
  // SimHash near-duplicates
  // -------------------------------------------------------------------------

  /** (id, simhash) per doc — 64-bit MD5-derived SimHash over the token
    * multiset (see [[graft.functions.SimHash64]]). Pure scan.
    */
  def simHashes(docs: DataFrame, idCol: String = "id",
                contentCol: String = "content"): DataFrame =
    docs.select(col(idCol).as("id"),
      HashFunctions.simHash64(TextFunctions.tokens(col(contentCol))).as("simhash"))

  /** Near-duplicate pairs with Hamming distance ≤ `maxHamming` between
    * 64-bit SimHashes. Banding on `maxHamming+1` equal-width bit chunks —
    * by pigeonhole two hashes within the distance bound agree on ≥1 chunk,
    * so candidate recall is EXACT (1.0); verification filters on the true
    * Hamming distance. One shuffle on (chunk index, chunk value).
    */
  def simHashDupPairs(docs: DataFrame, idCol: String = "id",
                      contentCol: String = "content",
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 64)")
    val chunks = maxHamming + 1
    val width = 64 / chunks // trailing bits join the last chunk
    val hashes = simHashes(docs, idCol, contentCol)
    val chunkCols = array((0 until chunks).map { c =>
      val shifted = shiftright(col("simhash"), c * width)
      if (c == chunks - 1) shifted // top chunk keeps all remaining bits
      else shifted.bitwiseAND(lit((1L << width) - 1))
    }: _*)
    val banded = hashes.select(col("id"), col("simhash"),
      posexplode(chunkCols).as(Seq("chunk", "cv")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // -------------------------------------------------------------------------
  // Embedding-cosine near-duplicates
  // -------------------------------------------------------------------------

  /** Near-duplicate pairs by embedding cosine ≥ `threshold`.
    *
    * Candidates come from random-hyperplane LSH buckets ([[Ann.lshTables]]):
    * only vectors sharing a bucket in ≥1 table are compared, then verified
    * with the exact codegen'd cosine. With `numTables` tables of `numPlanes`
    * hyperplanes, P[miss] = (1 − (1 − θ/π)^numPlanes)^numTables for angle θ.
    * Set `numTables = 0` for the exact all-pairs variant (correctness
    * baseline / small dimensions only).
    */
  def embeddingDupPairs(df: DataFrame, idCol: String = "id",
                        embCol: String = "embedding", threshold: Double = 0.9,
                        numTables: Int = 8, numPlanes: Int = 12,
                        dim: Int = 64, seed: Long = 42L): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .filter(col("emb").isNotNull)
    val candidates =
      if (numTables <= 0)
        base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      else {
        val buckets = Ann.lshTables(base, "id", "emb", numTables, numPlanes, dim, seed)
        buckets.as("a")
          .join(buckets.as("b"),
            col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
      }
    candidates
      .join(base.select(col("id").as("id_a"), col("emb").as("emb_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("emb").as("emb_b")), "id_b")
      .withColumn("cos", VectorFunctions.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
