package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * `DataSetUtils` indexing helpers (reference
 * `flink-java/.../utils/DataSetUtils.java:93` zipWithIndex — a
 * two-phase count-then-offset labeling — and `:190` zipWithUniqueId —
 * one-pass `(localCounter << bits) + taskId` sparse ids).
 *
 * Spark's `RDD.zipWithIndex` IS the reference's two-phase algorithm
 * (per-partition counts, prefix offsets, partition-local increments),
 * and `RDD.zipWithUniqueId` is the same one-pass trick with
 * `index·numPartitions + partitionId` labels — so both map directly;
 * the RDD drop-down is the genuine per-partition imperative case the
 * DataFrame API cannot express (no global window, no single-partition
 * bottleneck).
 */
object DataSetUtils {

  /** Contiguous 0..n−1 ids in the order of `order` columns: range-sort
   * then two-phase label. Deterministic given a total order (pass a
   * unique tiebreaker, as with any order-sensitive output). */
  def zipWithIndexOrdered(df: DataFrame, order: Column*): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = StructType(StructField("idx", LongType, nullable = false) +:
      sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(i +: r.toSeq) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Unique (not contiguous) ids in one pass — no counting job. Ids
   * depend on the physical partitioning, so they are stable within a
   * run but NOT across runs/engines (exactly the reference's
   * contract); assert properties, not values. */
  def zipWithUniqueId(df: DataFrame): DataFrame = {
    val schema = StructType(StructField("uid", LongType, nullable = false) +:
      df.schema.fields)
    val rdd = df.rdd.zipWithUniqueId.map { case (r, i) => Row.fromSeq(i +: r.toSeq) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
