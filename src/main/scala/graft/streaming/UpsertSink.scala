package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/**
 * Upsert sink materializer (reference
 * `table/runtime/operators/sink/SinkUpsertMaterializer.java` and the
 * upsert-kafka sink, `UpsertKafkaDynamicTableFactory.java`): apply a
 * +I/-U/+U/-D changelog stream to a keyed external table so the sink
 * always holds exactly the LATEST image per key — inserts/updates
 * replace, deletes remove.
 *
 * File sinks cannot update in place, so each micro-batch merges the
 * batch's changes into the current snapshot and commits a NEW
 * snapshot directory (`snap=<batchId>`); readers resolve the highest
 * committed snapshot. This is the same commit protocol a lakehouse
 * upsert sink uses (write-new-then-swap) — on a real deployment a
 * merge-on-read table format (or a compacted Kafka topic) replaces
 * the full-snapshot rewrite, but the per-batch merge plan is
 * identical: one hash shuffle of `prev ∪ changes` on the key, then a
 * per-key top-1 by sequence.
 *
 * Scale notes: the merge is one shuffle on the primary
 * key + a per-key row_number; no driver-side state, no collect. The
 * snapshot rewrite is O(table) per batch, which is the honest cost of
 * an updatable PLAIN-FILE sink; swap the write step for a MERGE INTO
 * on a real table format and everything above it is unchanged.
 */
object UpsertSink {

  private def snapDir(root: String, id: Long): String = f"$root%s/snap=$id%09d"

  /** Highest COMMITTED snapshot directory under `root`, if any — a
   * snapshot counts only once its parquet commit marker (_SUCCESS)
   * exists, so a crash mid-write never surfaces a torn snapshot.
   * `beforeId` restricts to snapshots with id < beforeId (replay). */
  def latestSnapshot(root: String, beforeId: Long = Long.MaxValue): Option[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("snap=") &&
        f.getName.stripPrefix("snap=").toLong < beforeId &&
        new java.io.File(f, "_SUCCESS").exists())
      .sortBy(_.getName)
      .lastOption
      .map(_.getAbsolutePath)
  }

  /** The final materialized table (latest snapshot; empty-by-schema if
   * no batch ever committed). */
  def read(spark: org.apache.spark.sql.SparkSession, root: String,
      schemaOf: DataFrame): DataFrame =
    latestSnapshot(root) match {
      case Some(p) => spark.read.parquet(p)
      case None => schemaOf.limit(0)
    }

  /** foreachBatch body: merge one changelog micro-batch into the sink.
   * `keys` is the primary key, `seqCol` the change sequence. Higher
   * sequence wins; AT EQUAL sequence the incoming change beats the
   * stored image (the reference's materializer applies messages in
   * arrival order, so a same-version message observed later wins), and
   * the after-image outranks the before-image. The batch must carry a
   * `row_kind` column in {+I,-U,+U,-D}.
   *
   * Replay-safe (foreachBatch is at-least-once): a replayed batchId
   * merges against the latest snapshot BEFORE it — never the possibly
   * half-written snapshot the crashed attempt left — and overwrites
   * that partial output; re-running a committed batch rebuilds the
   * identical snapshot. */
  def foreachBatchUpsert(root: String, keys: Seq[String], seqCol: String)
      (batch: Dataset[Row], batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    import graft.changelog.RowKind
    val spark = batch.sparkSession
    val changes = batch.toDF()
    val imageCols = changes.columns.filterNot(_ == "row_kind").toSeq
    val prev = latestSnapshot(root, beforeId = batchId) match {
      case Some(p) => spark.read.parquet(p)
      case None => changes.select(imageCols.map(col): _*).limit(0)
    }
    // the previous snapshot re-asserts its images at source rank 0;
    // batch changes carry rank 1, so an equal-sequence change
    // deterministically supersedes the stored image
    val union = prev
      .withColumn("row_kind", lit(RowKind.UpdateAfter))
      .withColumn("__src", lit(0))
      .unionByName(changes.select((imageCols :+ "row_kind").map(col): _*)
        .withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col("__src").desc,
        when(col("row_kind") === RowKind.UpdateBefore, 0).otherwise(1).desc)
    val merged = union
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("row_kind") =!= RowKind.Delete &&
        col("row_kind") =!= RowKind.UpdateBefore)
      .drop("__rn", "row_kind", "__src")
    merged.write.mode("overwrite").parquet(snapDir(root, batchId))
  }
}
