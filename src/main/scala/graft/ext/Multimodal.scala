package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (new-scope per BASELINE.json): media
  * (image/audio/video) travels as an opaque BINARY column with typed
  * metadata; decode/feature-extraction runs as a BATCHED executor-side
  * transform over `mapPartitions` — the Spark-side plumbing (schema,
  * partitioning, batch shape) is real; the decoder itself is pluggable.
  */
trait MediaDecoder extends Serializable {
  /** Batch contract: one call per bounded chunk of media blobs, one
    * fixed-length feature vector per blob (mirrors the Embedder contract,
    * reference src/sifts/core.py:90).
    */
  def decode(batch: Seq[Array[Byte]]): Seq[Array[Float]]
}

/** STUB decoder — the real image/audio codecs are not available in this
  * environment (per the build brief), so this computes deterministic
  * byte-level features standing in for a decoded representation:
  * [byte_count, 0x20-space count, 0x61-'a' count]. Swap for a real codec
  * behind the same batch contract.
  */
object ByteStatsDecoder extends MediaDecoder {
  def decode(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      var spaces = 0
      var as = 0
      var i = 0
      while (i < bytes.length) {
        if (bytes(i) == 0x20) spaces += 1
        if (bytes(i) == 0x61) as += 1
        i += 1
      }
      Array(bytes.length.toFloat, spaces.toFloat, as.toFloat)
    }
}

/** Perceptual-hash contract: one 64-bit hash per media blob, built so a
  * RE-ENCODED near-duplicate (small localized byte perturbations) lands
  * within a few bits of the original — the dHash/aHash family. A real
  * implementation decodes the image, downscales to a 9×8 luma grid, and
  * compares horizontally adjacent cells.
  *
  * `None` for a DEGENERATE blob — empty or constant (any length), or one
  * where every cell comparison ties: the hash carries zero perceptual
  * signal. Such
  * blobs must be EXCLUDED from pairing (they surface as NULL phash,
  * mirroring the NULL-media convention): hashing them all to the same
  * value would both emit false-positive "duplicate" pairs between
  * unrelated padding blobs (all-zero vs all-0xFF) and form one giant
  * bucket that degrades to star edges at scale.
  */
trait PerceptualHasher extends Serializable {
  def hash(batch: Seq[Array[Byte]]): Seq[Option[Long]]
}

/** STUB hasher — no image codec ships in this environment (build brief),
  * so the "decode + downscale" step is a deterministic 1-D analogue with
  * the same perceptual property over byte-level media stand-ins: the byte
  * stream resamples to a 9×8 grid of slice sums (slice k =
  * bytes[⌊k·n/72⌋, ⌊(k+1)·n/72⌋)), and dHash bit r·8+c is set when cell
  * (r, c+1)'s mean exceeds cell (r, c)'s — compared EXACTLY via integer
  * cross-multiplication (S₂·C₁ > S₁·C₂), never floating averages, so the
  * DuckDB oracle replays bit-for-bit. A localized byte change perturbs one
  * slice ⇒ ≤ 2 bits; swap for a real codec behind the same contract.
  */
object ByteDHash extends PerceptualHasher {
  val GridW = 9
  val GridH = 8
  private val Cells = GridW * GridH

  def hash(batch: Seq[Array[Byte]]): Seq[Option[Long]] = batch.map { bytes =>
    val n = bytes.length
    val sums = new Array[Long](Cells)
    val counts = new Array[Long](Cells)
    var minB = 256
    var maxB = -1
    var k = 0
    while (k < Cells) {
      val from = (k.toLong * n / Cells).toInt
      val until = ((k + 1).toLong * n / Cells).toInt
      var s = 0L
      var i = from
      while (i < until) {
        val b = bytes(i) & 0xFF
        if (b < minB) minB = b
        if (b > maxB) maxB = b
        s += b
        i += 1
      }
      sums(k) = s
      counts(k) = math.max(1, until - from)
      k += 1
    }
    var h = 0L
    var anyStrict = false
    var bit = 0
    while (bit < 64) {
      val idx = (bit / 8) * GridW + bit % 8
      val lhs = sums(idx + 1) * counts(idx)
      val rhs = sums(idx) * counts(idx + 1)
      if (lhs != rhs) anyStrict = true
      if (lhs > rhs) h |= 1L << bit
      bit += 1
    }
    // degenerate ⇔ no perceptual signal: a constant (or empty) byte stream
    // — any length, incl. < 72 bytes where empty slices would fake cell
    // variance — or a stream where ALL 64 cell comparisons tie exactly
    if (minB == maxB || !anyStrict) None else Some(h)
  }
}

/** Frame-sampling contract: `n` evenly-spaced frames per media blob as
  * (presentation timestamp ms, frame bytes). A real implementation wraps a
  * video codec; the batch shape mirrors [[MediaDecoder]].
  */
trait FrameExtractor extends Serializable {
  def extract(batch: Seq[Array[Byte]], n: Int): Seq[Seq[(Long, Array[Byte])]]
}

/** STUB extractor — no video codec ships in this environment (build
  * brief), so "frame i of n" is the i-th of n contiguous byte slices
  * (`[⌊i·len/n⌋, ⌊(i+1)·len/n⌋)`) at a fake 25 fps clock (pts = i·40 ms):
  * fully deterministic, so the Spark-side plumbing (batching, explode
  * shape, schema) is oracle-checkable byte-for-byte. Always n frames per
  * blob — a blob shorter than n bytes pads with zero-length frames, so
  * `frame_idx` stays the stable slice index.
  */
object SliceFrameExtractor extends FrameExtractor {
  def extract(batch: Seq[Array[Byte]], n: Int): Seq[Seq[(Long, Array[Byte])]] =
    batch.map { bytes =>
      (0 until n).map { i =>
        val from = (i.toLong * bytes.length / n).toInt
        val until = ((i + 1).toLong * bytes.length / n).toInt
        (i * 40L, java.util.Arrays.copyOfRange(bytes, from, until))
      }
    }
}

object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video|text
    StructField("media", BinaryType),
    StructField("meta", MapType(StringType, StringType))
  ))

  /** Batch size per decoder call — bounded executor memory for large blobs. */
  val DecodeBatchSize: Int = 64

  /** Adds `features ARRAY<FLOAT>` by running `decoder` over bounded batches
    * of the BINARY `mediaCol`, partition-parallel. NULL media -> NULL
    * features.
    */
  def featurize(df: DataFrame, decoder: MediaDecoder,
                mediaCol: String = "media", outCol: String = "features"): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType), nullable = true)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val bs = DecodeBatchSize
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { chunk =>
        val blobs = chunk.map(r => if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx))
        val present = blobs.zipWithIndex.collect { case (b, i) if b != null => (b, i) }
        val feats = if (present.isEmpty) Seq.empty else decoder.decode(present.map(_._1))
        // zip would silently truncate to the shorter side — a decoder that
        // skips an undecodable blob would hand those rows NULL features,
        // indistinguishable from NULL media; fail loudly instead
        require(feats.size == present.size,
          s"MediaDecoder returned ${feats.size} features for ${present.size} blobs")
        val byIdx = present.map(_._2).zip(feats).toMap
        chunk.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ byIdx.get(i).orNull)
        }
      }
    }(enc)
  }

  /** Adds `phash LONG` — the 64-bit perceptual hash — by running `hasher`
    * over bounded batches of the BINARY `mediaCol`, partition-parallel
    * (same batch plumbing as [[featurize]]). NULL media -> NULL phash;
    * a DEGENERATE blob (hasher returns None — empty/constant, zero
    * perceptual signal) also -> NULL phash, so downstream pairing skips it.
    */
  def perceptualHash(df: DataFrame, hasher: PerceptualHasher = ByteDHash,
                     mediaCol: String = "media",
                     outCol: String = "phash"): DataFrame = {
    val schema = df.schema.add(outCol, LongType, nullable = true)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val bs = DecodeBatchSize
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { chunk =>
        val blobs = chunk.map(r => if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx))
        val present = blobs.zipWithIndex.collect { case (b, i) if b != null => (b, i) }
        val hashes = if (present.isEmpty) Seq.empty else hasher.hash(present.map(_._1))
        require(hashes.size == present.size,
          s"PerceptualHasher returned ${hashes.size} hashes for ${present.size} blobs")
        val byIdx = present.map(_._2).zip(hashes).toMap
        chunk.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ byIdx.get(i).flatten.map(Long.box).orNull)
        }
      }
    }(enc)
  }

  /** Explodes each media blob into `n` sampled frames: every input row
    * yields up to `n` rows with `frame_idx INT`, `pts_ms LONG`,
    * `frame BINARY` appended (NULL media yields no frame rows — a missing
    * video has no frames; keep the doc row via a later join if needed).
    *
    * Scale: the extractor runs over bounded batches per partition
    * ([[DecodeBatchSize]] blobs per call — executor memory is bounded by
    * batch·blob size, not partition size), zero shuffle; the explode
    * multiplies ROWS, not bytes (frames partition the blob). Downstream
    * per-frame featurization composes with [[featurize]] on the `frame`
    * column.
    */
  def sampleFrames(df: DataFrame, n: Int,
                   extractor: FrameExtractor = SliceFrameExtractor,
                   mediaCol: String = "media"): DataFrame = {
    require(n >= 1, "n >= 1")
    val schema = df.schema
      .add("frame_idx", IntegerType, nullable = false)
      .add("pts_ms", LongType, nullable = false)
      .add("frame", BinaryType, nullable = false)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val bs = DecodeBatchSize
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { chunk =>
        val blobs = chunk.map(r => if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx))
        val present = blobs.zipWithIndex.collect { case (b, i) if b != null => (b, i) }
        val frames = if (present.isEmpty) Seq.empty else extractor.extract(present.map(_._1), n)
        require(frames.size == present.size,
          s"FrameExtractor returned ${frames.size} frame lists for ${present.size} blobs")
        val byIdx = present.map(_._2).zip(frames).toMap
        chunk.zipWithIndex.flatMap { case (r, i) =>
          byIdx.getOrElse(i, Seq.empty).zipWithIndex.map { case ((pts, fb), fi) =>
            Row.fromSeq(r.toSeq ++ Seq(fi, pts, fb))
          }
        }
      }
    }(enc)
  }

  /** Attaches a per-modality embedding column from a separate embedding
    * table (e.g. an image-encoder output) to the doc frame:
    * `docs ⋈ embeddings on id` -> `emb_<modality> ARRAY<FLOAT>`. Left join:
    * docs without that modality keep NULL. The join broadcasts when the
    * embedding side is small; otherwise shuffles on id like any equi-join.
    */
  def withModalityEmbedding(docs: DataFrame, embeddings: DataFrame,
                            modality: String, docId: String = "id",
                            embId: String = "id", embCol: String = "embedding"): DataFrame = {
    val emb = embeddings.select(col(embId).as(docId),
      col(embCol).cast(ArrayType(FloatType)).as(s"emb_$modality"))
    docs.join(emb, Seq(docId), "left")
  }

  /** Cross-modal top-k: rank docs by cosine of their `modality` embedding
    * against a query vector from another encoder (shared embedding space
    * assumed). Plans as TakeOrderedAndProject — no full sort.
    */
  def crossModalTopK(docs: DataFrame, modality: String, query: Seq[Float],
                     k: Int, idCol: String = "id"): DataFrame =
    graft.exec.VectorSearch.topK(
      docs.withColumnRenamed(s"emb_$modality", "__emb"), "__emb", query, k, idCol = idCol)
      .withColumnRenamed("__emb", s"emb_$modality")
}
