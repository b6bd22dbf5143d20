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

  /** The materialized RDD behind a `localCheckpoint()`ed DataFrame
   * (its plan is a `LogicalRDD` leaf). Used to free a finished
   * iteration round's blocks EAGERLY — `Dataset.unpersist` does not
   * reach checkpoint blocks, and waiting for the ContextCleaner lets
   * dead rounds pressure the block manager across a long suite. */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }
}
