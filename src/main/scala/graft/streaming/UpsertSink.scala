package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import graft.changelog.ChangelogOps

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
 * Scale notes: the merge is `normalize` — one shuffle on the primary
 * key + a per-key row_number; no driver-side state, no collect. The
 * snapshot rewrite is O(table) per batch, which is the honest cost of
 * an updatable PLAIN-FILE sink; swap the write step for a MERGE INTO
 * on a real table format and everything above it is unchanged.
 */
object UpsertSink {

  private def snapDir(root: String, id: Long): String = f"$root%s/snap=$id%09d"

  /** Highest committed snapshot directory under `root`, if any. */
  def latestSnapshot(root: String): Option[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("snap="))
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
   * `keys` is the primary key, `seqCol` the change sequence (higher
   * wins; at equal sequence the after-image outranks the before-image,
   * per [[ChangelogOps.normalize]]). The batch must carry a `row_kind`
   * column in {+I,-U,+U,-D}. */
  def foreachBatchUpsert(root: String, keys: Seq[String], seqCol: String)
      (batch: Dataset[Row], batchId: Long): Unit = {
    val spark = batch.sparkSession
    val changes = batch.toDF()
    val imageCols = changes.columns.filterNot(_ == "row_kind").toSeq
    val prev = latestSnapshot(root) match {
      case Some(p) => spark.read.parquet(p)
      case None => changes.select(imageCols.map(col): _*).limit(0)
    }
    // the previous snapshot re-asserts its images (each keeps its
    // stored sequence, so only strictly-newer changes supersede it)
    val merged = ChangelogOps.normalize(
      prev.withColumn("row_kind", lit(graft.changelog.RowKind.UpdateAfter))
        .unionByName(changes.select((imageCols :+ "row_kind").map(col): _*)),
      keys, seqCol)
    merged.write.mode("overwrite").parquet(snapDir(root, batchId))
  }
}
