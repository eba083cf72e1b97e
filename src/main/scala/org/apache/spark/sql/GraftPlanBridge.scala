package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset factory so the engine
  * can materialize a DataFrame from a custom LogicalPlan (the standard
  * extension-library technique — Catalyst exposes plan injection via
  * SparkSessionExtensions but no public plan→DataFrame constructor). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst expression (Spark 4 moved `.expr` behind the
    * classic column-node converter; the session's converter resolves
    * the node fully rather than wrapping it lazily). */
  def expr(spark: SparkSession, c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Memory-manager page size for external sorters (what SortExec
    * passes to UnsafeExternalRowSorter) — `private[spark]`, so exposed
    * from inside the package tree. */
  def pageSizeBytes: Long =
    org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes
}
