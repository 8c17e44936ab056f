package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between graft's native Catalyst expressions and the public
 * `Column` API. Spark 4 moved the Expression↔Column conversions behind
 * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
 * libraries that ship custom expressions expose them through a shim in
 * the `org.apache.spark.sql` namespace — this is the only file outside
 * the `graft` package.
 */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /**
   * Codegen/optimizer barrier with NO row conversion: downstream plans
   * see a scan of the upstream's InternalRow RDD, so CollapseProject
   * cannot re-inline the upstream projection into downstream
   * expression chains (the 64KB-method pathology), while rows stream
   * straight through — no cache, and none of the InternalRow↔Row
   * round-trip the public `createDataFrame(df.rdd, schema)` form pays
   * (`internalCreateDataFrame` is private[sql], hence this shim).
   *
   * Preconditions — this is for NARROW batch projections only:
   * `toRdd` plans the input EAGERLY at construction time, and under
   * AQE an upstream exchange would materialize its shuffle stages
   * right here (jobs during query construction); explain() downstream
   * also shows only `Scan ExistingRDD`, hiding the upstream plan. A
   * streaming or Connect Dataset is not supported (classic session
   * cast).
   */
  def planBarrier(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Drain the listener bus (`private[spark]`): a harness snapshotting
    * listener-accumulated task metrics at a batch boundary must see
    * every already-finished task's event delivered first, or the tail
    * of one batch's work is misattributed to the next. */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
