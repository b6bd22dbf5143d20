package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Multi-sink DAG reuse (SURVEY §4.1 last row: the reference's
 * `StreamCommonSubGraphBasedOptimizer.scala:49` reuses common subplans
 * across sinks of one statement set; Spark plans each action
 * separately, so the shared prefix must be persisted explicitly).
 *
 * Batch: persist the shared frame, run every sink, unpersist.
 * Streaming: one query, `foreachBatch` multiplexing the micro-batch to
 * every sink (the batch df inside foreachBatch is computed once and
 * persisted per batch).
 */
object MultiSink {

  /** Run every sink against the SAME materialization of `shared`. */
  def runBatch(shared: DataFrame, sinks: Seq[DataFrame => Unit]): Unit = {
    val df = shared.persist(StorageLevel.MEMORY_AND_DISK)
    try sinks.foreach(_(df))
    finally df.unpersist()
  }

  /** foreachBatch body fanning one micro-batch out to every sink. */
  def foreachBatchFanout(sinks: Seq[(DataFrame, Long) => Unit])(df: DataFrame, batchId: Long): Unit = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    try sinks.foreach(_(cached, batchId))
    finally cached.unpersist()
  }
}
