package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV corpus source/sink — the other interchange format corpus snapshots
  * and metadata tables arrive in. Same scale rules as [[Jsonl]], with the
  * CSV-specific ones added:
  *
  *   - ALWAYS read with an explicit schema: `inferSchema` is a full extra
  *     pass over the corpus before the real query starts.
  *   - `multiLine` stays false: with quoted embedded newlines disallowed,
  *     every split parses independently; multiLine CSV is one split — one
  *     core — per file. Corpora with newline-bearing text belong in JSONL
  *     (that is why [[Jsonl]] is the primary format), so the WRITER here
  *     fails fast when a value carries a newline rather than silently
  *     producing a file this reader mis-parses.
  *   - Header on: self-describing files survive column reorders.
  */
object Csv {

  /** Reads a CSV corpus under `path` (file, directory, or glob) with an
    * explicit schema. Quoted fields (commas, escaped quotes) parse per
    * RFC 4180; absent trailing fields read as null.
    */
  def readDocs(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"") // RFC 4180 doubled-quote escaping
      .csv(path)

  /** Writes a DataFrame as headered CSV part files under `path`. Fails the
    * job when any string value contains a newline — a silent multiLine
    * write would need `multiLine=true` (one core per file) to read back.
    */
  def writeDocs(df: DataFrame, path: String, saveMode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions._
    val stringCols = df.schema.fields.filter(_.dataType.typeName == "string").map(_.name)
    val guarded = stringCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).contains("\n") || col(c).contains("\r"),
          raise_error(concat(lit(s"csv write: newline in column '$c' of row id="),
            coalesce(col(acc.columns.head).cast("string"), lit("?")),
            lit(" — use Jsonl for newline-bearing corpora"))))
          .otherwise(col(c)))
    }
    guarded.write.mode(saveMode)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
  }
}
