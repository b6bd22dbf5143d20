package graft.sources

import graft.SparkSuite
import graft.sinks.IdempotentSink
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DSv2 source (bounded + unbounded faces) and the exactly-once sink
 * pattern. */
class SourceSinkSpec extends SparkSuite {

  test("DSv2 datagen: bounded read covers the range across the planned splits") {
    import spark.implicits._
    val df = spark.read.format("graft.sources.DatagenSource")
      .option("rows", "100").option("partitions", "4").load()
    val rows = df.as[(Long, Int)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 100L))
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    assert(rows.filter(_._1 < 25).forall(_._2 == 0)) // contiguous splits
  }

  test("DSv2 datagen: the unbounded face yields the same rows as the bounded one") {
    val stream = spark.readStream.format("graft.sources.DatagenSource")
      .option("rows", "100").option("partitions", "4").load()
    val got = StreamOps.runToBatch(spark, stream, "append", "t_dsv2")
      .agg(count(lit(1)), sum(col("id"))).head()
    assert(got.getLong(0) == 100L && got.getLong(1) == (0L until 100L).sum)
  }

  test("idempotent 2PC-style sink: replayed batches are skipped, uncommitted stages overwritten") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_2pc").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    IdempotentSink.parquet(out)(df, batchId = 0)
    // replay of the same epoch must be a no-op even with different data
    IdempotentSink.parquet(out)(Seq((99L, "x")).toDF("k", "v"), batchId = 0)
    val back = IdempotentSink.readCommitted(spark, out).as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b")))
    // a new epoch lands additively
    IdempotentSink.parquet(out)(Seq((3L, "c")).toDF("k", "v"), batchId = 1)
    assert(IdempotentSink.readCommitted(spark, out).count() == 3)
  }

  test("end-to-end: stream → foreachBatch idempotent sink → committed read-back") {
    val out = Files.createTempDirectory("graft_2pc_e2e").toString
    val stream = spark.readStream.format("graft.sources.DatagenSource")
      .option("rows", "50").option("partitions", "2").load()
    val q = stream.writeStream
      .foreachBatch(IdempotentSink.parquet(out) _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(IdempotentSink.readCommitted(spark, out).count() == 50)
  }

  test("JDBC upsert sink: replayed batches are idempotent, later batches overwrite keys") {
    import graft.sinks.JdbcUpsertSink
    import spark.implicits._
    val url = s"jdbc:derby:${Files.createTempDirectory("graft_jdbc_upsert")}/db;create=true"
    JdbcUpsertSink.resetTable(url, "T", "k BIGINT PRIMARY KEY, v BIGINT")
    def readBack(): Set[(Long, Long)] =
      spark.read.format("jdbc").option("url", url).option("dbtable", "T")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()
        .toDF("k", "v").as[(Long, Long)].collect().toSet
    val b1 = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    JdbcUpsertSink.upsert(b1, url, "T", Seq("k", "v"), "k")
    assert(readBack() == Set((1L, 10L), (2L, 20L)))
    // micro-batch REPLAY (same rows again): delete-before-insert makes
    // the write idempotent — no duplicate-key failure, same table
    JdbcUpsertSink.upsert(b1, url, "T", Seq("k", "v"), "k")
    assert(readBack() == Set((1L, 10L), (2L, 20L)))
    // a later batch overwrites shared keys and adds new ones
    JdbcUpsertSink.upsert(Seq((2L, 21L), (3L, 30L)).toDF("k", "v"),
      url, "T", Seq("k", "v"), "k")
    assert(readBack() == Set((1L, 10L), (2L, 21L), (3L, 30L)))
  }
}
