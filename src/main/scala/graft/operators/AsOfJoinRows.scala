package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Row-generic BATCH as-of join — the schema-dynamic sibling of
 * [[AsOfJoin]], used by the `FOR SYSTEM_TIME AS OF` SQL rewrite
 * (`graft.rules.StreamTemporalJoinRule`) when both inputs are bounded:
 * the reference plans the same clause into its batch temporal join
 * (`flink-table-planner/.../exec/batch/` temporal-join translation);
 * here it becomes the union + ordered-window formulation of
 * [[AsOfJoin]] — one hash shuffle on the key, per-key sort, LINEAR in
 * input size (never the |left|×|right| pre-rank explosion of a naive
 * range join), the plan that survives 100 TB.
 *
 * Semantics match the streaming operator: newest dim version with
 * (time, seq) at-or-before the probe's time; version AT the probe's
 * instant visible (inclusive); among same-instant versions the highest
 * `seq` wins.
 */
object AsOfJoinRows {

  private def microsCol(df: DataFrame, idx: Int): Column = {
    val f = df.schema.fields(idx)
    f.dataType match {
      case LongType => col(df.columns(idx))
      case _: TimestampType | _: TimestampNTZType | DateType =>
        unix_micros(col(df.columns(idx)).cast("timestamp"))
      case dt => throw new IllegalArgumentException(
        s"as-of join time column '${f.name}' has unsupported type $dt")
    }
  }

  /** @return DataFrame with schema = probe fields ++ dim fields (dim
   *          fields forced nullable). */
  def run(probe: DataFrame, dim: DataFrame,
      probeKeyIdx: Int, probeTimeIdx: Int,
      dimKeyIdx: Int, dimTimeIdx: Int, dimSeqIdx: Int,
      leftOuter: Boolean): DataFrame = {
    val pdf = probe.toDF((0 until probe.schema.length).map(i => s"p$i"): _*)
    val ddf = dim.toDF((0 until dim.schema.length).map(i => s"d$i"): _*)
    val pType = StructType(pdf.schema.fields)
    val dType = StructType(ddf.schema.fields)

    val lt = pdf.select(
      struct(pdf.columns.map(col).toSeq: _*).as("__p"),
      col(pdf.columns(probeKeyIdx)).cast("string").as("__k"),
      microsCol(pdf, probeTimeIdx).as("__t"),
      lit(1).as("__side"),
      lit(null).cast("long").as("__tie"),
      lit(null).cast(dType).as("__dv"))
    val rt = ddf.select(
      lit(null).cast(pType).as("__p"),
      col(ddf.columns(dimKeyIdx)).cast("string").as("__k"),
      microsCol(ddf, dimTimeIdx).as("__t"),
      lit(0).as("__side"),
      col(ddf.columns(dimSeqIdx)).cast("long").as("__tie"),
      struct(ddf.columns.map(col).toSeq: _*).as("__dv"))

    // dim rows (side 0) sort before probes at the same instant, so an
    // at-instant version is visible; among same-instant versions the
    // highest seq is last and wins the running `last(ignoreNulls)`
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lt.unionByName(rt)
      .withColumn("__d", last(col("__dv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val kept = if (leftOuter) joined else joined.filter(col("__d").isNotNull)
    kept.select(
      pdf.columns.map(c => col(s"__p.$c").as(c)).toSeq ++
        ddf.columns.map(c => col(s"__d.$c").as(c)).toSeq: _*)
  }
}
