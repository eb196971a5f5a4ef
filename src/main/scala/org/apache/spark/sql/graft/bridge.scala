package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: Column <-> Expression
  * conversion and DataFrame-from-LogicalPlan for the classic
  * (non-Connect) API. Lives under org.apache.spark.sql so the
  * package-private members resolve; keep it to exactly these calls.
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode -> catalyst conversion: unlike `expression`,
    * which returns a lazy ColumnNodeExpression wrapper (fine inside
    * Dataset operators, NOT fine embedded in a custom LogicalPlan — the
    * wrapper holds non-serializable internal nodes), this produces the
    * real catalyst tree immediately. */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-wrap a batch frame as isStreaming=true — the shape
    * MicroBatchExecution asserts on every DataFrame a DSv1
    * `Source.getBatch` returns (the engine splices it under the
    * streaming plan). Same internalCreateDataFrame call Spark's own
    * file stream source makes; private[sql], hence bridged here. */
  def asStreamingFrame(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** The inverse re-wrap: a micro-batch frame the engine hands a DSv1
    * `Sink.addBatch` is streaming-tagged; a batch write (MERGE) must
    * re-plan it as a plain batch frame — without decoding to Row and
    * back (same internalCreateDataFrame, isStreaming=false; what
    * Spark's own ForeachBatchSink does). */
  def asBatchFrame(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)

  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.logical
}
