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

  test("co-process kryo state survives a query restart") {
    // the two-input co-process buffers its pending rows + shared user
    // state in a kryo-encoded CoProcState; a restart from the same
    // checkpoint must restore it — side-1 rows ingested BEFORE the
    // stop must still be counted by a side-2 row arriving AFTER.
    val src = Files.createTempDirectory("graft_copr_src").toString
    val out = Files.createTempDirectory("graft_copr_out").toString
    val ckpt = Files.createTempDirectory("graft_copr_ckpt").toString
    import spark.implicits._
    val Sec = 1000000L
    val Far = 7258118400000000L

    def writeFile(name: String, rows: Seq[(Int, Long, Long, Long, Long)],
        mtimeMs: Long): Unit = {
      rows.toDF("side", "k", "t_us", "id", "amt").coalesce(1)
        .write.mode("overwrite").parquet(s"$src/$name")
      Files.list(Paths.get(s"$src/$name")).forEach(p =>
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs)))
    }

    def runOnce(): Unit = {
      val env = spark.readStream
        .schema("side INT, k BIGINT, t_us BIGINT, id BIGINT, amt BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*")
      val clicks = env.filter(col("side") === 0 || col("id") < 0)
        .as[(Int, Long, Long, Long, Long)].map(r => CsA(r._2, r._3, r._4, r._5))
      val acts = env.filter(col("side") === 1 || col("id") < 0)
        .as[(Int, Long, Long, Long, Long)].map(r => CsB(r._2, r._3, r._4))
      val outDs = ConnectedOps.keyedCoProcessOrdered[CsA, CsB, (Long, Long), CsOut](
        clicks, _.k, _.t_us, _.id,
        acts, _.k, _.t_us, _.id,
        zero = (0L, 0L),
        on1 = (_, st, x) => ((st._1 + 1, st._2 + x.amt), Nil),
        on2 = (k, st, y) => (st, Seq(CsOut(k, y.id, st._1, st._2))))
      val q = outDs.toDF().writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // phase 1: two clicks only — the acts leg has no rows, so the
    // min-combined watermark holds everything in (kryo) state
    writeFile("p1", Seq((0, 1L, 10 * Sec, 1L, 5L), (0, 1L, 20 * Sec, 2L, 7L)), 10000L)
    runOnce()

    // phase 2 (fresh run, same checkpoint): an act between the two
    // buffered clicks, then two sentinel rounds to flush
    writeFile("p2", Seq((1, 1L, 15 * Sec, 100L, 0L)), 20000L)
    writeFile("s1", Seq((0, 1L, Far + 1, -1L, 0L), (1, 1L, Far + 1, -1L, 0L)), 30000L)
    writeFile("s2", Seq((0, 1L, Far + 2, -1L, 0L), (1, 1L, Far + 2, -1L, 0L)), 40000L)
    runOnce()

    val got = spark.read.parquet(out)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 1L, 5L)),
      s"restored co-process state must count the pre-restart click at 10s " +
      s"(and only it) for the act at 15s; got $got")
  }
}
