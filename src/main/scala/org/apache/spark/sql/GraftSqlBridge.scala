package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  * Spark 4 made these conversions `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so the one project
  * package that hosts custom expressions reaches them through this shim —
  * the same technique every Spark extension library uses. Nothing else in
  * graft touches Spark internals.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; aliasing it here lets
    * graft expressions declare `inputTypes` (ExpectsInputTypes) so mistyped
    * SQL arguments fail at analysis instead of at runtime. */
  type AbstractDT = org.apache.spark.sql.types.AbstractDataType

  /** Register a function on an already-built session (the extensions hook
    * only runs at session build; `sessionState` is `private[sql]`). */
  def registerFunction(spark: SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
