package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal (as-of) join: enrich each left row with the most recent right
 * row whose time is <= the left row's time, per key.
 *
 * Re-expresses the reference's temporal join
 * (`flink-table-planner/.../exec/stream/StreamExecTemporalJoin.java:67`,
 * runtime `flink-table-runtime/.../join/temporal/TemporalRowTimeJoinOperator.java`)
 * Spark-first, as a *union + ordered window* instead of a join:
 *
 *   union(left tagged, right tagged)
 *     → window PARTITION BY key ORDER BY (time, side, tiebreak)
 *     → last(right_payload, ignoreNulls) over rows unbounded preceding
 *     → keep left rows
 *
 * Scale rationale: a naive `join ON key AND r.t <= l.t` + rank explodes
 * to |left_per_key| × |right_per_key| intermediate rows before ranking;
 * this formulation is one hash shuffle on the key and a per-key sort —
 * linear in input size, the same cost profile as the reference's
 * state-backed operator, and safe at 1000-executor scale (skew bounded
 * by per-key row counts, mitigable with AQE skew handling).
 *
 * Tie semantics: right rows at the same timestamp are ordered by
 * `rightTieBreak` ascending, so the largest tiebreak wins; right rows at
 * exactly the left row's timestamp ARE visible (inclusive <=).
 */
object AsOfJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val lt = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val rt = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).as("__tie"),
      struct(rightCols.map(col): _*).as("__r"))

    val unioned = lt.unionByName(rt, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__lastr", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__lastr").getField(c).as(c)): _*)
  }
}
