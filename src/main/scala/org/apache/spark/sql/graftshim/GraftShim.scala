package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal bridge into `private[sql]` surface — the standard pattern for
  * Spark extension libraries (a DataFrame from a LogicalPlan has no public
  * constructor). Kept to one call so the internal-API exposure is a single
  * audited point.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
