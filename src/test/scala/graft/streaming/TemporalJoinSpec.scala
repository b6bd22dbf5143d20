package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming temporal join: versioned enrichment, tie rules, and the
 * proc-time cross-batch behavior. */
class TemporalJoinSpec extends SparkSuite {

  private def dim(key: Long, t: Long, seq: Long, v: Double) =
    TjInput(isDim = true, key, t, seq, 0, v)
  private def probe(id: Long, key: Long, t: Long) =
    TjInput(isDim = false, key, t, 0, id, 0.0)

  test("probe matches the latest version at-or-before its time; same-instant version visible") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[TjInput]
    val q = TemporalJoin.run(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_tj1").outputMode("append").start()
    try {
      ms.addData(
        dim(1, 100, 1, 10.0), dim(1, 200, 2, 20.0), dim(1, 200, 3, 30.0), // seq tie at t=200
        probe(101, 1, 150), probe(102, 1, 200), probe(103, 1, 50))
      q.processAllAvailable()
      val out = spark.table("t_tj1").as[TjOutput].collect()
        .map(o => o.probe_id -> o.matched_seq).toMap
      assert(out == Map(
        101L -> Some(1L),  // version at t=100
        102L -> Some(3L),  // same instant visible; seq tie → max seq
        103L -> None))     // before any version
    } finally q.stop()
  }

  test("watermark retention keeps only live dim versions in state") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val ms = MemoryStream[TjInput]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tj_retain").toString
    val q = TemporalJoin.run(ms.toDS(), "1 second").toDF()
      .writeStream.format("memory").queryName("t_tj_retain").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      val hourUs = 3600L * 1000000
      (0 until 6).foreach { b =>
        ms.addData(dim(1, b * hourUs, b + 1, b * 10.0),
          probe(100 + b, 1, b * hourUs + 1000000))
        q.processAllAvailable()
      }
      // every probe matched the version current at its time
      val out = spark.table("t_tj_retain").as[TjOutput].collect()
        .map(o => o.probe_id -> o.matched_seq).toMap
      assert(out == (0 until 6).map(b => (100L + b) -> Some(b + 1L)).toMap)
      // 6 versions ingested; state keeps only versions above the
      // watermark plus the single newest at-or-before it
      val sizes = spark.read.format("statestore").load(ckpt)
        .select(size(col("value.groupState.versions"))).as[Int].collect()
      assert(sizes.nonEmpty && sizes.forall(_ <= 2),
        s"version history not watermark-pruned: ${sizes.toList}")
    } finally q.stop()
  }

  test("cross-batch: later probes see versions from earlier batches (proc-time semantics)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[TjInput]
    val q = TemporalJoin.run(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_tj2").outputMode("append").start()
    try {
      ms.addData(probe(201, 2, 500)) // no version known yet
      q.processAllAvailable()
      ms.addData(dim(2, 100, 7, 70.0), probe(202, 2, 500))
      q.processAllAvailable()
      val out = spark.table("t_tj2").as[TjOutput].collect()
        .map(o => o.probe_id -> o.matched_seq).toMap
      assert(out == Map(201L -> None, 202L -> Some(7L)))
    } finally q.stop()
  }
}
