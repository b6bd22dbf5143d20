package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CUMULATE window table-function: expanding windows sharing a start.
 *
 * Re-expresses the reference's cumulate slicing
 * (`flink-table-planner/.../exec/stream/StreamExecWindowTableFunction.java:49`,
 * slice assignment `flink-table-runtime/.../operators/window/slicing/SliceAssigners.java`)
 * Spark-first: instead of a stateful slice-merging operator, each row is
 * exploded into the cumulate windows that contain it —
 * `[start, start+step), [start, start+2*step) … [start, start+size)` —
 * and a plain (codegen'd, partial-agg-friendly) groupBy on
 * (w_start, w_end) follows.
 *
 * Scale rationale: the fan-out factor is size/step (a small constant
 * chosen by the query, e.g. 6 for 1h/10m), applied map-side before the
 * aggregation's shuffle — the shuffle then carries only per-slice
 * partial aggregates, the same traffic shape as the reference's
 * slice-based operator. No state, no driver involvement.
 */
object CumulateWindow {

  /**
   * Adds `w_start`/`w_end` columns, one output row per cumulate window
   * containing the event. `stepMinutes` must divide `sizeMinutes`.
   */
  def apply(df: DataFrame, tsCol: String, stepMinutes: Int, sizeMinutes: Int): DataFrame = {
    require(sizeMinutes % stepMinutes == 0, "step must divide size")
    val slices = sizeMinutes / stepMinutes
    df.withColumn("w_start", window(col(tsCol), s"$sizeMinutes minutes").getField("start"))
      .withColumn("__k", explode(sequence(lit(1), lit(slices))))
      .withColumn("w_end", expr(s"w_start + make_interval(0, 0, 0, 0, 0, __k * $stepMinutes, 0)"))
      .filter(col("w_end") > col(tsCol))
      .drop("__k")
  }
}
