package graft.sinks

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/**
 * Exactly-once sink pattern (SURVEY §2.1 / §7.3 hard part 7; reference
 * `TwoPhaseCommitSinkFunction.java:77`): Spark's micro-batch replay +
 * an idempotent batch commit gives end-to-end exactly-once without
 * distributed 2PC — the pre-commit/commit split maps onto
 * stage-then-mark:
 *
 *  1. pre-commit: write the batch under an epoch (= batchId) directory;
 *  2. commit: atomically create the `_COMMITTED` marker;
 *  3. replayed batches (same id, marker present) are skipped — reruns
 *     after failure overwrite the UNcommitted stage, never a committed
 *     one.
 *
 * Readers consume only marker-bearing directories. Kafka-transactional
 * parity would swap stage/mark for beginTransaction/commit on the
 * producer — the control flow is identical.
 */
object IdempotentSink {

  /** `foreachBatch` body: `stream.writeStream.foreachBatch(
   * IdempotentSink.parquet(outDir) _)`. */
  def parquet(outDir: String)(df: DataFrame, batchId: Long): Unit = {
    val dir = s"$outDir/batch=$batchId"
    val marker = Paths.get(dir, "_COMMITTED")
    if (Files.exists(marker)) return // replayed batch → idempotent skip
    df.write.mode("overwrite").parquet(dir) // pre-commit: stage
    Files.createFile(marker) // commit point
  }

  /** Read back only committed epochs. */
  def readCommitted(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val committed = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && Files.exists(Paths.get(d.getPath, "_COMMITTED")))
      .map(_.getPath)
    require(committed.nonEmpty, s"no committed batches under $outDir")
    spark.read.parquet(committed.toSeq: _*)
  }
}
