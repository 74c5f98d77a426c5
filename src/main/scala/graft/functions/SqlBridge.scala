// Bridge into Spark's private[sql] surface: Column <-> Expression
// conversion and session function registration are private[sql] in
// Spark 4, so this one object lives in the org.apache.spark.sql
// package. No Spark internals are modified — it only re-exports two
// conversions and the registry handle.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** Drop the storage blocks behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` cannot reach them (the checkpoint lives in
    * the RDD wrapped by the plan's `LogicalRDD`, not in the cache
    * manager), so without this an iterative/memoized workload leaks
    * executor block storage until a full GC lets the ContextCleaner
    * notice — measured as 2x sweep-to-sweep bench variance. No-op for
    * frames that are not local checkpoints. The caller must be done
    * with the frame: a truncated-lineage RDD cannot recompute freed
    * blocks. */
  def unpersistLocalCheckpoint(df: Dataset[Row]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Unload every lingering state-store provider (private[sql] in
    * Spark 4). A stopped streaming query's providers stay registered —
    * holding the last ~2 versions of each partition's state map, or
    * RocksDB native memory — until the 60 s maintenance tick notices
    * the query is gone; a replay harness that runs many short-lived
    * queries per minute unloads them eagerly instead. Safe against
    * concurrent streams: an unloaded provider reloads from its
    * checkpoint on next access. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
