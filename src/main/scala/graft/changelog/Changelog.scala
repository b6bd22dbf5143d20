package graft.changelog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * RowKind / changelog layer (SURVEY §7.3 hard part 1; reference
 * `flink-core/.../types/RowKind.java:25`,
 * `exec/stream/StreamExecChangelogNormalize.java:61`).
 *
 * Spark has no first-class retraction stream, so the changelog is a
 * COLUMN CONVENTION: a `row_kind` string in {+I,-U,+U,-D} carried next
 * to the payload. `toChangelog` derives the retract stream of a
 * versioned table; `normalize` collapses any changelog back to its
 * final table image (the upsert-materialization every sink performs,
 * and what the reference's ChangelogNormalize node does for upsert
 * sources).
 *
 * Scale notes: both directions are one hash shuffle on the key plus
 * per-key ordered window work — no driver involvement, skew bounded by
 * per-key change counts.
 */
object RowKind {
  val Insert = "+I"
  val UpdateBefore = "-U"
  val UpdateAfter = "+U"
  val Delete = "-D"
}

object ChangelogOps {

  /** Derive the retract changelog of a versioned table: per key in
   * `versionCol` order, the first row emits +I, every later row emits
   * the -U of its predecessor image and its own +U. */
  def toChangelog(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    val withRn = df.withColumn("__rn", row_number().over(w))
    val inserts = withRn.filter(col("__rn") === 1)
      .withColumn("row_kind", lit(RowKind.Insert))
    val updatesAfter = withRn.filter(col("__rn") > 1)
      .withColumn("row_kind", lit(RowKind.UpdateAfter))
    val updatesBefore = df
      .select(keys.map(col) ++ payload.map(c => lag(col(c), 1).over(w).as(c)) :+
        row_number().over(w).as("__rn"): _*)
      .filter(col("__rn") > 1)
      .withColumn("row_kind", lit(RowKind.UpdateBefore))
    inserts.unionByName(updatesBefore).unionByName(updatesAfter)
      .drop("__rn")
  }

  /** Retraction-aware DOWNSTREAM aggregate (reference
   * `FlinkChangelogModeInferenceProgram` planning retract mode into
   * downstream aggregates, and the retract() path of its aggregate
   * functions): consume a +I/-U/+U/-D changelog with a GROUP BY and
   * produce per-group COUNT + SUMs equal to aggregating every key's
   * LATEST image — the CDC → aggregate shape. Each change applies
   * SIGNED (+1 for +I/+U, -1 for -U/-D), so an update that MOVES a row
   * between groups retracts it from the old group and adds it to the
   * new one; groups whose rows are all retracted disappear (count 0),
   * as the reference's retractable agg state does.
   *
   * Scale: one hash shuffle on the group key with map-side partial
   * aggregation — retraction costs nothing extra. */
  def aggregateChangelog(changelog: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val sign = when(col("row_kind").isin(RowKind.UpdateBefore, RowKind.Delete), lit(-1L))
      .otherwise(lit(1L))
    changelog.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        sumCols.map(c => sum(sign * col(c)).as(s"sum_$c")): _*)
      .filter(col("n_rows") > 0)
  }

  /** ChangelogNormalize: final table image of a changelog — the
   * highest-version +I/+U per key, unless the key's latest change is a
   * -D (then the key is gone). `seqCol` orders changes within a key;
   * -U rows never win (they describe the pre-image). */
  def normalize(changelog: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc,
        // at equal version the after-image outranks the before-image
        when(col("row_kind") === RowKind.UpdateBefore, 0).otherwise(1).desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("row_kind") =!= RowKind.Delete &&
        col("row_kind") =!= RowKind.UpdateBefore)
      .drop("__rn", "row_kind")
  }
}
