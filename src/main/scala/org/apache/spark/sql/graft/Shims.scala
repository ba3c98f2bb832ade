package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark internals that are `private[sql]` in 4.x (the classic
  * Column ↔ Expression converters and the session function registry). Lives
  * under org.apache.spark.sql so the package-private APIs resolve — the same
  * pattern every Spark extension library uses for custom expressions.
  */
object Shims {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Physical plan of a streaming query's most recent micro-batch — the
    * only way to assert executed-plan shape (Exchange count, re-derived
    * aggregates) for stream-static joins in tests. */
  def lastExecutedPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.execution.SparkPlan =
    q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan

  /** Register a Catalyst expression builder as a SQL function name. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
