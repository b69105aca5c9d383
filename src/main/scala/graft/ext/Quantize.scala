package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Int8 scalar quantization for embedding columns — the storage/IO
  * compression path of the ANN family (FAISS `SQ8` analogue, built on
  * DataFrames): each vector is rescaled to bytes by its own max-abs,
  * `q_i = round(x_i / scale)` with `scale = max|x| / 127`, stored as
  * ARRAY<TINYINT> — 4× smaller than the FLOAT array, which is 4× less
  * parquet scan, 4× less shuffle mass, and 4× more vectors per executor
  * heap at 100 TB. Reconstruction error is bounded by `scale / 2` per
  * coordinate.
  *
  * Cosine similarity is scale-invariant, so ranking over quantized vectors
  * needs NO rescale at all — [[int8TopK]] scores the byte vectors directly
  * and only the similarity VALUES (not the order) drift by the quantization
  * noise; the x47 entry gates recall against the exact float ranking.
  *
  * Everything here is closed-form builtin composition (`transform` /
  * `array_max` / `floor`), codegen'd, ZERO shuffle — quantization is a
  * scan-shaped rewrite of the embedding column.
  */
object Quantize {

  /** Adds `scaleCol` (DOUBLE, `max|x| / 127`) and `qCol` (ARRAY<TINYINT>,
    * `round(x / scale)` via the tie-stable `floor(x/scale + 0.5)` — the same
    * closed form an independent engine can replay exactly). All-zero vectors
    * quantize to all-zero bytes with scale 0; null embeddings stay null.
    */
  def quantizeInt8(df: DataFrame, embCol: String = "embedding",
                   qCol: String = "q", scaleCol: String = "scale"): DataFrame = {
    val v = col(embCol).cast(ArrayType(DoubleType))
    val amax = array_max(transform(v, x => abs(x)))
    val scale = amax / lit(127.0)
    val q = when(scale === 0.0, transform(v, _ => lit(0).cast(ByteType)))
      .otherwise(transform(v, x => floor(x / scale + lit(0.5)).cast(ByteType)))
    df.withColumn(scaleCol, scale).withColumn(qCol, q)
  }

  /** Reconstructed float vector: `q_i · scale`. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => (x * scale).cast(FloatType))

  /** Exact top-k over the QUANTIZED corpus: quantize both sides, score
    * cosine on the byte vectors (scale cancels), rank like [[Ann.exactTopK]]
    * — the plan is the same per-partition-k-heap `TakeOrderedAndProject`
    * scan, reading 1/4 the bytes. Use as the first pass of a two-stage
    * retrieve (int8 scan → float rerank of the top-m) when exact float
    * order matters.
    */
  def int8TopK(corpus: DataFrame, queries: Seq[(String, Seq[Float])], k: Int,
               idCol: String = "id", embCol: String = "embedding"): DataFrame = {
    val qz = quantizeInt8(corpus.filter(col(embCol).isNotNull), embCol)
    val qCorpus = qz.select(col(idCol),
      transform(col("q"), x => x.cast(FloatType)).as(embCol))
    val qQueries = queries.map { case (qid, vec) =>
      val amax = vec.foldLeft(0.0) { (a, x) => math.max(a, math.abs(x.toDouble)) }
      val s = amax / 127.0
      qid -> (if (s == 0.0) vec.map(_ => 0f)
              else vec.map(x => math.floor(x / s + 0.5).toFloat))
    }
    Ann.exactTopK(qCorpus, qQueries, k, idCol, embCol)
  }

  /** Bulk-query sibling of [[int8TopK]]: quantize the corpus ONCE, quantize
    * each query, and score every (corpus, query) pair in a single
    * broadcast-queries scan ([[Ann.exactTopKAll]]'s shape) — Q queries cost
    * one corpus pass, not Q.
    */
  def int8TopKAll(corpus: DataFrame, queries: Seq[(String, Seq[Float])], k: Int,
                  idCol: String = "id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qz = quantizeInt8(corpus.filter(col(embCol).isNotNull), embCol)
    val qCorpus = qz.select(col(idCol),
      transform(col("q"), x => x.cast(FloatType)).as(embCol))
    val qQueries = queries.map { case (qid, vec) =>
      val amax = vec.foldLeft(0.0) { (a, x) => math.max(a, math.abs(x.toDouble)) }
      val s = amax / 127.0
      qid -> (if (s == 0.0) vec.map(_ => 0f)
              else vec.map(x => math.floor(x / s + 0.5).toFloat))
    }
    Ann.exactTopKAll(qCorpus, qQueries.toDF("qid", "qvec"), k, idCol, embCol)
  }

  /** Johnson–Lindenstrauss dimensionality reduction with a DETERMINISTIC
    * ±1 sign matrix (Achlioptas 2003): adds `outCol` =
    * (Σ_i sign(j,i)·x_i)/√outDim per output dim j. Sign(j,i) derives from
    * md5("seed|j|i") — the same hex-prefix-mod-2 arithmetic both engines
    * can replay exactly ([[Pipeline.md5Mod]]'s convention), so the
    * projection is oracle-checkable value-for-value, and re-running a
    * pipeline (or projecting a DIFFERENT corpus against the same seed)
    * lands in the same projected space.
    *
    * Scale: the matrix is outDim·inDim bytes built once driver-side and
    * shipped inside the codegen'd [[graft.functions.SignedProjection]]
    * expression — a ZERO-shuffle scan-shaped rewrite; downstream
    * shuffles, k-means, and brute-force ANN scans then carry
    * outDim/inDim of the bytes (64→8 = 8× less vector mass).
    */
  def randomProject(df: DataFrame, outDim: Int, inDim: Int,
                    embCol: String = "embedding", outCol: String = "proj",
                    seed: Long = 42L): DataFrame = {
    require(outDim >= 1 && inDim >= 1, "dims >= 1")
    require(outDim.toLong * inDim <= 16_000_000L,
      "sign matrix above 16M entries — reduce dims (it rides the plan)")
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Byte = {
      md.reset()
      val hex = md.digest(s"$seed|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      // first 12 hex chars as a long, mod 2 — Pipeline.md5Mod's arithmetic
      if (java.lang.Long.parseLong(hex.substring(0, 12), 16) % 2 == 0) 1 else -1
    }
    val signs = Array.tabulate(outDim * inDim)(n => sign(n / inDim, n % inDim))
    df.withColumn(outCol,
      graft.functions.VectorFunctions.signProject(col(embCol), signs, outDim, inDim))
  }
}
