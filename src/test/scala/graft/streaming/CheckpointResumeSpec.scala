package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * Checkpoint recovery (reference checkpointing / savepoint restore,
 * `CheckpointCoordinator.java` semantics at the user-visible level): a
 * stopped streaming query restarted with the SAME checkpoint location
 * resumes from its committed offsets — already-processed input is
 * never re-emitted, new input is. Together with the idempotent 2PC
 * sink (SourceSinkSpec) this is the exactly-once story end to end.
 */
class CheckpointResumeSpec extends SparkSuite {

  test("restart with the same checkpoint resumes from committed offsets") {
    val src = Files.createTempDirectory("graft_ckpt_src").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_loc").toString
    import spark.implicits._

    def writeFile(name: String, ids: Seq[Long]): Unit =
      ids.toDF("id").coalesce(1).write.mode("overwrite")
        .parquet(s"$src/$name")

    def runOnce(): Unit = {
      val sdf = spark.readStream
        .schema("id BIGINT")
        .parquet(s"$src/*")
      val q = sdf.select(col("id"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile("a", Seq(1L, 2L, 3L))
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))

    // second run, SAME checkpoint: the old file is not reprocessed,
    // only the new one flows
    writeFile("b", Seq(10L, 11L))
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 10L, 11L),
      "restart must resume from committed offsets, not reprocess")

    // a third run with NO new input emits nothing new
    runOnce()
    assert(spark.read.parquet(out).count() === 5)
    // the checkpoint actually recorded sources/offsets on disk
    assert(Files.exists(Paths.get(ckpt, "offsets")))
  }

  test("stateful job upgrade: restart with a modified downstream projection keeps accumulated state") {
    // reference flink-stream-stateful-job-upgrade-test: stop a
    // stateful job, change its topology AROUND the stateful operator
    // (the operator itself and its state schema unchanged), restart
    // from the same snapshot, and the accumulated state carries over.
    // Spark analog: same checkpointLocation, same streaming aggregate,
    // modified downstream projection — an allowed query change.
    val src = Files.createTempDirectory("graft_upg_src").toString
    val out = Files.createTempDirectory("graft_upg_out").toString
    val ckpt = Files.createTempDirectory("graft_upg_ckpt").toString
    import spark.implicits._

    def writeFile(name: String, ks: Seq[String]): Unit =
      ks.toDF("k").coalesce(1).write.mode("overwrite").parquet(s"$src/$name")

    def runOnce(upgraded: Boolean): Unit = {
      val counts = spark.readStream.schema("k STRING").parquet(s"$src/*")
        .groupBy(col("k")).count()
      // v2 adds a derived column downstream of the (unchanged) agg
      val shaped = if (upgraded) counts.withColumn("scaled", col("count") * 10)
        else counts
      val q = shaped.writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("overwrite").parquet(out) // complete image per batch
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile("f1", Seq("a", "a", "b"))
    runOnce(upgraded = false)
    assert(spark.read.parquet(out).select("k", "count").as[(String, Long)]
      .collect().toSet == Set(("a", 2L), ("b", 1L)))

    // upgrade: new projection, SAME checkpoint — counts must CONTINUE
    // from the restored state, not restart from zero
    writeFile("f2", Seq("a", "b", "b"))
    runOnce(upgraded = true)
    assert(spark.read.parquet(out).select("k", "count", "scaled")
      .as[(String, Long, Long)].collect().toSet ==
      Set(("a", 3L, 30L), ("b", 3L, 30L)),
      "upgraded topology must resume the aggregate's accumulated state")
  }
}
