package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors that a library building custom
  * logical plans needs: turning a [[LogicalPlan]] back into a DataFrame.
  * Spark offers no public API for this (SPARK-31561); every library that
  * ships custom plan nodes uses a package-located accessor like this one.
  * Single call site: `graft.plans.TopK`. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
