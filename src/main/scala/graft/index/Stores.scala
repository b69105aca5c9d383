package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed stores for the engine, all laid out as
  * `<root>/<store>/collection=<name>/…` so every read is partition-pruned by
  * collection — the Spark-native replacement for the reference's btree on the
  * `name` column (reference: src/sifts/core.py:112, 615).
  *
  * Mutations rewrite ONE collection partition via write-to-temp + atomic-ish
  * directory swap (the reference's per-op transaction, core.py:446-455, becomes
  * a partition commit; on a real deployment this layer is where a table format
  * with transactional commits would slot in).
  */
object Stores {

  val docsSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("content", StringType),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("embedding", ArrayType(FloatType), nullable = true)
  ))

  /** postings: one row per (doc, term); `tf` term frequency, `dl` doc length
    * in tokens (denormalized for BM25 — avoids a per-query join to a doc-length
    * table).
    */
  val postingsSchema: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false)
  ))

  /** collstats: single row per collection — N docs, avg doc length. */
  val collStatsSchema: StructType = StructType(Seq(
    StructField("n_docs", LongType, nullable = false),
    StructField("avg_dl", DoubleType, nullable = false)
  ))

  /** annindex: one row per (doc, LSH table) with the doc's bucket in that
    * table; the generating plane parameters ride along as constant columns
    * (parquet RLE-encodes them to nothing) so the index is self-describing.
    * Stored range-clustered + sorted by (table, bucket) — probe predicates
    * are literal (table, bucket) filters that prune row groups.
    */
  val annSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("table", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("num_tables", IntegerType, nullable = false),
    StructField("num_planes", IntegerType, nullable = false),
    StructField("dim", IntegerType, nullable = false),
    StructField("seed", LongType, nullable = false)
  ))

  def docsDir(root: String) = s"$root/docs"
  def postingsDir(root: String) = s"$root/postings"
  def collStatsDir(root: String) = s"$root/collstats"
  def annDir(root: String) = s"$root/annindex"

  private def partDir(storeDir: String, collection: String): String =
    s"$storeDir/collection=${java.net.URLEncoder.encode(collection, "UTF-8")}"

  /** The on-disk path of one collection's partition of a store (the path a
    * scan of that partition reports as its root — e.g. the ANN-rewrite
    * registry key).
    */
  def partitionPath(storeDir: String, collection: String): String =
    partDir(storeDir, collection)

  /** Whether one collection's partition of a store exists on disk. */
  def partitionExists(spark: SparkSession, storeDir: String, collection: String): Boolean =
    exists(spark, partDir(storeDir, collection))

  /** Read one collection's partition of a store; empty (with schema) if absent. */
  def readPartition(spark: SparkSession, storeDir: String, collection: String,
                    schema: StructType): DataFrame = {
    val dir = partDir(storeDir, collection)
    if (exists(spark, dir)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Overwrite one collection's partition: write to a temp dir under the same
    * filesystem, then swap it into place. `df` must NOT contain the collection
    * column (it lives in the directory name).
    */
  def overwritePartition(spark: SparkSession, storeDir: String, collection: String,
                         df: DataFrame, sortBy: Seq[String] = Nil): Unit = {
    val dest = new Path(partDir(storeDir, collection))
    val tmp = new Path(s"$storeDir/.tmp-${java.util.UUID.randomUUID().toString}")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = if (sortBy.nonEmpty) df.sortWithinPartitions(sortBy.head, sortBy.tail: _*) else df
    out.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.mkdirs(dest.getParent)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"partition swap failed: $tmp -> $dest")
  }

  /** Drop one collection's partition entirely (reference `delete_all`,
    * core.py:386-400 — becomes a directory drop).
    */
  def dropPartition(spark: SparkSession, storeDir: String, collection: String): Unit = {
    val dest = new Path(partDir(storeDir, collection))
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dest)) fs.delete(dest, true)
  }

  /** All collections present under a store dir (partition directory names). */
  def collections(spark: SparkSession, storeDir: String): Seq[String] = {
    val dir = new Path(storeDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("collection="))
      .map(s => java.net.URLDecoder.decode(s.getPath.getName.stripPrefix("collection="), "UTF-8"))
  }

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
