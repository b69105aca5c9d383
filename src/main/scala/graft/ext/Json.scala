package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Semi-structured (JSON string) column handling — the `props`-style bag
  * every event/log table carries. New-scope per BASELINE.json: a training
  * pipeline flattens these bags into typed columns before filtering or
  * joining on them.
  *
  * Split deliberately in two: schema INFERENCE is a bounded sampling job
  * (pay once, driver holds only a StructType), EXTRACTION is a codegen'd
  * `from_json` scan that never shuffles. At 100 TB you infer on a ≤
  * `maxSample`-row deterministic sample and extract with the pinned schema
  * everywhere — never let full-corpus inference (a second full scan) into
  * the plan.
  */
object Json {

  /** Infer the struct schema of JSON string column `jsonCol` from a
    * bounded deterministic sample: a hash arm (membership-by-md5 on the
    * JSON text — [[Pipeline.md5Mod]] — stable across runs/retries and
    * partitionings, covering the VALUE space rather than row space, which
    * is what schema inference actually needs) unioned with a small
    * head-limit arm. The head arm is the floor: when the value space is
    * tiny (a handful of templated bags repeated billions of times), a
    * fractional value-hash can select zero values, and an empty sample
    * would infer an empty schema. Inference is Spark's own JSON schema
    * reader (same unioning/widening rules as `spark.read.json`), which
    * this wraps rather than re-invents.
    */
  def inferSchema(df: DataFrame, jsonCol: String, maxSample: Long = 100000L): StructType = {
    require(maxSample >= 1, "maxSample >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val nonNull = df.select(col(jsonCol).cast("string").as("j")).filter(col("j").isNotNull)
    // upper estimate: one cheap count on the pruned single-column scan;
    // fraction chooses ~maxSample of them, floor 1e-6 keeps it sane
    val n = nonNull.count()
    val sampled =
      if (n <= maxSample) nonNull
      else {
        val frac = math.max(maxSample.toDouble / n, 1e-6)
        nonNull.filter(Pipeline.md5Mod(col("j"), 1000000L) < math.round(frac * 1000000L))
          .unionByName(nonNull.limit(math.min(maxSample, 1000L).toInt))
      }
    // malformed sample rows surface as the corrupt-record column in the
    // inferred schema; extraction handles malformed rows itself
    // (PERMISSIVE nulls), so the sentinel column is noise here
    val corrupt = spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    StructType(spark.read.json(sampled.as[String]).schema.filterNot(_.name == corrupt))
  }

  /** Flatten JSON string column `jsonCol` into typed top-level columns
    * `prefix<field>` using `schema` (pin one from [[inferSchema]] or
    * declare it). Malformed rows yield NULL fields (PERMISSIVE), the rest
    * of the row survives — a poison record cannot fail the scan. The
    * original JSON column is dropped; everything else is passed through.
    * One codegen'd projection, zero shuffle, source columns pruned as
    * usual.
    */
  def extract(df: DataFrame, jsonCol: String, schema: StructType,
              prefix: String = ""): DataFrame = {
    // fail fast on name collisions: with an empty prefix an inferred field
    // that matches a passthrough column (e.g. a props field named event_id)
    // would silently produce an ambiguous frame that only errors on a later
    // select-by-name
    val keptNames = df.columns.filter(_ != jsonCol).toSet
    val clashes = schema.fieldNames.map(f => s"$prefix$f").filter(keptNames)
    require(clashes.isEmpty,
      s"extracted JSON fields collide with existing columns: " +
        s"${clashes.mkString(", ")} — pass a prefix or rename the columns")
    val parsed = from_json(col(jsonCol).cast("string"), schema.asInstanceOf[DataType])
    val tmp = WorkingColumns.fresh(df, "__j")
    val withP = df.withColumn(tmp, parsed)
    val kept = df.columns.filter(_ != jsonCol).map(c => withP(s"`$c`"))
    val fields: Array[Column] =
      schema.fieldNames.map(f => col(s"`$tmp`").getField(f).as(s"$prefix$f"))
    withP.select(kept ++ fields: _*)
  }

  /** One-call convenience: infer on the bounded sample, then extract. */
  def flatten(df: DataFrame, jsonCol: String, maxSample: Long = 100000L,
              prefix: String = ""): DataFrame =
    extract(df, jsonCol, inferSchema(df, jsonCol, maxSample), prefix)
}
