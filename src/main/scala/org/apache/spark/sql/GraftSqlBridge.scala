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

  /** Release the cached blocks behind a `localCheckpoint`ed Dataset. A
    * checkpointed round of an iterative loop retains its blocks until the
    * RDD is garbage-collected; a convergence loop that checkpoints every
    * round therefore accumulates one generation of blocks PER ROUND —
    * measured as the driver-JVM OOM on the 30M-edge CC rung of the
    * round-8 scaling ladder. The checkpoint RDD lives in the Dataset's
    * `LogicalRDD` (sql.execution — `private[sql]`), hence here. No-op for
    * non-checkpointed frames. */
  def releaseCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Register a function on an already-built session (the extensions hook
    * only runs at session build; `sessionState` is `private[sql]`). */
  def registerFunction(spark: SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
