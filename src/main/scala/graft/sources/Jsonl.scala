package graft.sources

import graft.ext.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSONL corpus source/sink — the interchange format of training-data
  * pipelines (one JSON doc per line). New-scope: the reference ingests via
  * its API only; a Spark engine wants the file path too.
  *
  * Scale rules encoded here rather than left to callers:
  *   - ALWAYS read with an explicit schema. `spark.read.json` without one
  *     runs schema inference — a full extra pass over the corpus before
  *     the real query starts; at 100 TB that is the difference between one
  *     scan and two.
  *   - `multiLine` stays false (the default): line-delimited JSON is
  *     splittable — every executor seeks to a newline and parses its own
  *     block. A multi-line JSON array is ONE split, i.e. one core.
  *   - Writes go through the normal partitioned writer; pair with
  *     [[writeShards]] for the deterministic training-shard layout.
  */
object Jsonl {

  /** The engine's document-exchange schema ([[graft.api.Collection.addDf]]
    * shape): id, content, string-map metadata.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("content", StringType),
    StructField("metadata", MapType(StringType, StringType))))

  /** Reads a JSONL corpus under `path` (file, directory, or glob) with the
    * given explicit schema. Fields absent on a line read as null; a
    * corrupt line fails the job under the default PERMISSIVE mode only if
    * the caller selects `_corrupt_record` — add it to the schema to audit
    * instead of drop.
    */
  def readDocs(spark: SparkSession, path: String,
               schema: StructType = docSchema): DataFrame =
    spark.read.schema(schema).json(path)

  /** Writes any DataFrame as JSONL part files under `path`. Null fields
    * are omitted per line (the compact convention readers expect).
    */
  def writeDocs(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Training-shard sink: [[Pipeline.shuffleShards]]' deterministic global
    * shuffle materialized as one directory per shard (`shard=N/`), each
    * holding its rows JSONL-encoded with the within-shard `pos` column —
    * the layout a dataloader consumes directly. One hash shuffle, then
    * every shard writes in parallel.
    */
  def writeShards(df: DataFrame, path: String, numShards: Int,
                  seed: Long = 0L, idCol: String = "id"): Unit =
    Pipeline.shuffleShards(df, numShards, seed, idCol)
      .write.mode("overwrite").partitionBy("shard").json(path)
}
