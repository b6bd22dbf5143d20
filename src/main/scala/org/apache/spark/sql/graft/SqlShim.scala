package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the graft rules need: materialize a
 * DataFrame from a rewritten logical plan (`Dataset.ofRows` — the same
 * entry every Spark-internal rule and connector uses; in Spark 4 it
 * lives on the classic Dataset). This object sits in an
 * `org.apache.spark.sql` subpackage solely for access; no Spark code
 * is modified or shadowed. */
object SqlShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
