package graft.exec

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact cosine top-k over an ARRAY<FLOAT> column.
  *
  * The reference's SQLite path materializes EVERY embedding of the collection
  * in driver memory and numpy-sorts (src/sifts/core.py:527-542) — its #1
  * scalability cliff. Here scoring is a codegen'd expression evaluated
  * executor-side and `orderBy(desc).limit(k)` plans as
  * `TakeOrderedAndProject`: each partition keeps a k-sized heap, the driver
  * merges k·numPartitions rows — never the full collection. Deterministic
  * tiebreak on id.
  */
object VectorSearch {

  /** Adds `rank` = cosine(embCol, query); rows with NULL embedding drop
    * (reference scores only embedded rows).
    */
  def scored(docs: DataFrame, embCol: String, query: Seq[Float]): DataFrame =
    docs
      .filter(col(embCol).isNotNull)
      .withColumn("rank", VectorFunctions.cosine(col(embCol), VectorFunctions.vecLit(query)))

  /** Top-k by similarity, deterministic order (sim desc, id asc). limit<=0 =>
    * full ranking via sort (still distributed).
    */
  def topK(docs: DataFrame, embCol: String, query: Seq[Float], k: Int,
           offset: Int = 0, idCol: String = "id"): DataFrame = {
    val ranked = scored(docs, embCol, query).orderBy(col("rank").desc, col(idCol).asc)
    Paginator(ranked, k, offset)
  }
}
