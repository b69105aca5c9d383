package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Column<->Expression converters of the
  * Spark 4 classic API (org.apache.spark.sql.classic.ExpressionUtils), so the
  * graft engine can expose native Catalyst expressions as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Install a function builder into an existing session's registry (the
    * `SparkSessionExtensions` path only reaches sessions created after the
    * extension is configured; this covers already-running ones).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Table-function analog of [[registerFunction]]: a builder producing a
    * LogicalPlan, callable in the FROM clause of this session's SQL.
    */
  def registerTableFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                            builder: Seq[Expression] => org.apache.spark.sql.catalyst
                              .plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** The classic session's `private[sql]` UUID — a stable per-session key
    * (distinct across `newSession()` clones, unlike the shared context).
    */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Ship a Hadoop Configuration into task closures via Spark's own
    * `private[spark]` SerializableConfiguration (what every built-in file
    * source uses; Configuration itself is not Serializable). Returned as a
    * serializable thunk because the wrapper CLASS is not nameable outside
    * org.apache.spark.
    */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration)
      : () => org.apache.hadoop.conf.Configuration = {
    val sc = new org.apache.spark.util.SerializableConfiguration(conf)
    () => sc.value
  }
}
