package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-membership shim: `classic.Dataset.ofRows` is `private[sql]`,
  * and constructing a DataFrame from a custom [[LogicalPlan]] node
  * (graft's IntervalOverlapJoin) needs it. This is the standard
  * extension-library technique — one object inside the `sql` package,
  * nothing else of Spark's internals touched.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
