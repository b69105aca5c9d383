package graft.ext

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Random-hyperplane LSH bucket ids over an ARRAY<FLOAT> embedding: one
  * 64-bit bucket per table, bit p of table t set iff dot(emb, plane_{t,p}) ≥ 0.
  * Planes are N(0,1) vectors drawn from a seed-fixed PRNG — signatures are
  * deterministic across runs and executors. Single-pass, zero shuffle
  * (the 100 TB property: bucketing is a scan; only the bucket join shuffles).
  */
case class LshBuckets(child: Expression, numTables: Int, numPlanes: Int,
                      dim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes <= 64, "at most 64 planes per table (bits of a long)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val planes: Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numTables * numPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    // Fail fast rather than silently bucketing on a prefix of the vector —
    // a truncated dot product degrades recall below the documented
    // (1-(1-θ/π)^planes)^tables bound with no visible symptom.
    if (xs.numElements() > dim)
      throw new IllegalArgumentException(
        s"lsh_buckets: embedding has ${xs.numElements()} dims but planes were drawn for dim=$dim; " +
          "pass dim >= the embedding dimension")
    val n = math.min(xs.numElements(), dim)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val plane = planes(t * numPlanes + p)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += xs.getFloat(i).toDouble * plane(i); i += 1 }
        if (dot >= 0.0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Similarity search over embedding columns (new-scope per BASELINE.json;
  * generalizes the reference's exact scan, src/sifts/core.py:527-542 /
  * pgvector `<=>`, core.py:319-321).
  */
object Ann {

  def lshBucketCol(emb: Column, numTables: Int, numPlanes: Int, dim: Int,
                   seed: Long = 42L): Column =
    Bridge.column(LshBuckets(Bridge.expression(emb), numTables, numPlanes, dim, seed))

  /** (id, table, bucket) — the LSH index frame. Build once, reuse per probe
    * (persist or write as a bucketed table in a real deployment).
    */
  def lshTables(df: DataFrame, idCol: String, embCol: String, numTables: Int,
                numPlanes: Int, dim: Int, seed: Long = 42L): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(lshBucketCol(col(embCol), numTables, numPlanes, dim, seed))
          .as(Seq("table", "bucket")))

  /** EXACT top-k neighbors for a (small, driver-side) batch of queries.
    * Each query plans as `TakeOrderedAndProject` — per-partition k-heaps,
    * merge of k·partitions rows, never a full sort or a full-corpus shuffle —
    * unioned into one job. Output: (qid, rn, id, sim), rn = 1-based rank.
    */
  def exactTopK(corpus: DataFrame, queries: Seq[(String, Seq[Float])], k: Int,
                idCol: String = "id", embCol: String = "embedding"): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(embCol).as("emb"))
      .filter(col("emb").isNotNull)
    queries.map { case (qid, qvec) =>
      val scored = base
        .withColumn("sim", VectorFunctions.cosine(col("emb"), VectorFunctions.vecLit(qvec)))
        .orderBy(col("sim").desc, col("id").asc)
        .limit(k)
        .select(lit(qid).as("qid"), col("id"), col("sim"))
      scored
    }.reduce(_ unionByName _)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)))
      .select(col("qid"), col("rn"), col("id"), col("sim"))
  }

  /** Exact top-k for a DataFrame of queries (qid, qvec) — the bulk-scoring
    * shape (e.g. all-pairs retrieval for a training epoch): broadcast the
    * query side, score every (corpus, query) pair in one codegen'd pass,
    * rank per query. The per-query shuffle carries only scored candidates
    * hashed by qid; with Q queries this is the Q·N scan any exact batch
    * retrieval pays, parallel over the corpus.
    */
  def exactTopKAll(corpus: DataFrame, queries: DataFrame, k: Int,
                   idCol: String = "id", embCol: String = "embedding",
                   qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(embCol).as("emb"))
      .filter(col("emb").isNotNull)
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast(ArrayType(FloatType)).as("qvec"))
    base.join(broadcast(q))
      .withColumn("sim", VectorFunctions.cosine(col("emb"), col("qvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("id"), col("sim"))
  }

  /** APPROXIMATE top-k: probe only the corpus vectors sharing an LSH bucket
    * with the query in ≥1 table, exact-cosine rerank inside the candidate
    * set. Probe cost is |candidates| ≪ |corpus| (sub-linear in practice);
    * recall is tuned by (numTables, numPlanes).
    */
  def lshTopK(corpus: DataFrame, queries: Seq[(String, Seq[Float])], k: Int,
              idCol: String = "id", embCol: String = "embedding",
              numTables: Int = 16, numPlanes: Int = 4, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("id"), col(embCol).as("emb"))
      .filter(col("emb").isNotNull)
    val index = lshTables(base, "id", "emb", numTables, numPlanes, dim, seed)

    val queryDf = queries.toDF("qid", "qvec")
      .select(col("qid"), col("qvec").cast(ArrayType(FloatType)).as("qvec"))
    val queryBuckets = queryDf.select(col("qid"), col("qvec"),
      posexplode(lshBucketCol(col("qvec"), numTables, numPlanes, dim, seed))
        .as(Seq("table", "bucket")))

    val candidates = index
      .join(broadcast(queryBuckets), Seq("table", "bucket"))
      .select(col("qid"), col("qvec"), col("id"))
      .distinct()

    candidates
      .join(base, "id")
      .withColumn("sim", VectorFunctions.cosine(col("emb"), col("qvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("id"), col("sim"))
  }

  /** Recall@k of `approx` against `exact` (both (qid, rn, id, …) frames
    * truncated at k): |approx ∩ exact| / |exact|.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select("qid", "id")
    val a = approx.select("qid", "id")
    val hit = e.join(a, Seq("qid", "id"), "left_semi").count()
    val tot = e.count()
    if (tot == 0) 1.0 else hit.toDouble / tot
  }
}
