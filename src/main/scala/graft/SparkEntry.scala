package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator registry lives in [[EntryQueries]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = EntryQueries.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2 + ext/. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = EntryQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries -> rows-only check.
    */
  def oracleSql: Map[String, String] = EntryQueries.oracleSql
}
