package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Multi-batch semantics of the stateful streaming operators, driven by
 * MemoryStream so micro-batch boundaries are controlled explicitly —
 * the Spark analog of the reference's keyed-operator test harnesses
 * (`KeyedOneInputStreamOperatorTestHarness`).
 */
class StatefulOpsSpec extends SparkSuite {

  private def ev(id: Long, user: Long, typ: String, tsUs: Long, v: Double = 1.0) =
    Ev(id, user, typ, tsUs, v)

  test("keep-last dedup: winner survives out-of-order late arrivals across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = StatefulOps.keepLastByUser(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_keeplast").outputMode("update").start()
    try {
      ms.addData(ev(1, 1, "click", 100), ev(2, 1, "view", 200))
      q.processAllAvailable()
      ms.addData(ev(3, 1, "view", 150)) // late arrival, older than winner
      q.processAllAvailable()
      ms.addData(ev(4, 1, "buy", 300), ev(5, 2, "view", 50))
      q.processAllAvailable()
      val emitted = spark.table("t_keeplast").as[Ev].collect()
      // the late event must NOT have been emitted (winner unchanged)
      assert(emitted.map(_.event_id).toSet == Set(2L, 4L, 5L))
      val finalPerUser = emitted.groupBy(_.user_id)
        .view.mapValues(_.maxBy(e => (e.ts_us, e.event_id)).event_id).toMap
      assert(finalPerUser == Map(1L -> 4L, 2L -> 5L))
    } finally q.stop()
  }

  test("streaming top-n: buffer evolves across batches; re-rank of updates equals true top-n") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = StatefulOps.topNByType(ms.toDS(), 2).toDF()
      .writeStream.format("memory").queryName("t_topn").outputMode("update").start()
    try {
      ms.addData(ev(1, 1, "a", 1, 10.0), ev(2, 1, "a", 2, 5.0))
      q.processAllAvailable()
      ms.addData(ev(3, 1, "a", 3, 7.0)) // displaces id=2 from top-2
      q.processAllAvailable()
      ms.addData(ev(4, 1, "a", 4, 1.0)) // below top-2: no state change
      q.processAllAvailable()
      val updates = spark.table("t_topn").as[TopNRow].collect()
      val top2 = updates.distinct.sortBy(r => (-r.value, r.event_id)).take(2).map(_.event_id)
      assert(top2.toSeq == Seq(1L, 3L))
      // the no-change batch must not have re-emitted the buffer
      assert(updates.count(_.event_id == 1L) == 2) // emitted in batch 1 and 2 only
    } finally q.stop()
  }

  test("top-n changelog: evictions emit -D, entrants +I; normalize gives exact membership") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = StatefulOps.topNChangelog(ms.toDS(), 2).toDF()
      .writeStream.format("memory").queryName("t_topn_cl").outputMode("append").start()
    try {
      ms.addData(ev(1, 1, "a", 1, 10.0), ev(2, 1, "a", 2, 5.0))
      q.processAllAvailable()
      ms.addData(ev(3, 1, "a", 3, 7.0)) // displaces id=2
      q.processAllAvailable()
      ms.addData(ev(4, 1, "a", 4, 1.0)) // below top-2: no change rows
      q.processAllAvailable()
      val changes = spark.table("t_topn_cl").as[TopNChange].collect().sortBy(_.out_seq)
      assert(changes.map(c => (c.row_kind, c.event_id)).toList ==
        List(("+I", 1L), ("+I", 2L), ("-D", 2L), ("+I", 3L)))
      val members = graft.changelog.ChangelogOps.normalize(
          spark.table("t_topn_cl"), Seq("event_type", "event_id"), "out_seq")
        .select("event_id").as[Long].collect().toSet
      assert(members == Set(1L, 3L))
    } finally q.stop()
  }

  test("running aggregate: fold continues from state across ordered batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = StatefulOps.runningByUser(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_running").outputMode("append").start()
    try {
      ms.addData(ev(1, 7, "a", 100, 1.50), ev(2, 7, "a", 200, 2.25))
      q.processAllAvailable()
      ms.addData(ev(3, 7, "a", 300, 0.10))
      q.processAllAvailable()
      val rows = spark.table("t_running").as[RunningRow].collect().sortBy(_.event_id)
      assert(rows.map(r => (r.event_id, r.running_n, r.running_cents)).toSeq ==
        Seq((1L, 1L, 150L), (2L, 2L, 375L), (3L, 3L, 385L)))
    } finally q.stop()
  }

  test("streaming tumble aggregation equals its batch twin on the same data") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val data = Seq(
      ev(1, 1, "a", 0L, 1.0), ev(2, 1, "a", 10L * 60 * 1000 * 1000, 2.0),
      ev(3, 2, "b", 20L * 60 * 1000 * 1000, 3.0), ev(4, 2, "a", 40L * 60 * 1000 * 1000, 4.0))
    val ms = MemoryStream[Ev]
    val agg = StatefulOpsSpecHelper.tumbleCounts(ms.toDS().toDF())
    val q = agg.writeStream.format("memory").queryName("t_tumble").outputMode("complete").start()
    try {
      ms.addData(data.take(2): _*)
      q.processAllAvailable()
      ms.addData(data.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("t_tumble")
        .orderBy("ws", "event_type").collect().toSeq
      val batch = StatefulOpsSpecHelper.tumbleCounts(data.toDF())
        .orderBy("ws", "event_type").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("broadcast-state analog: control rows update the threshold that filters data rows") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def ctl(typ: String, thr: Double, tsUs: Long) =
      Tagged(isControl = true, typ, thr, 0, 0, tsUs, 0)
    def data(id: Long, typ: String, v: Double, tsUs: Long) =
      Tagged(isControl = false, typ, 0, id, 1, tsUs, v)
    val ms = MemoryStream[Tagged]
    val q = StatefulOps.thresholdFilter(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_bcast").outputMode("append").start()
    try {
      ms.addData(ctl("a", 5.0, 0), data(1, "a", 3.0, 10), data(2, "a", 7.0, 20))
      q.processAllAvailable()
      ms.addData(data(3, "a", 4.0, 30))          // still below threshold 5
      q.processAllAvailable()
      ms.addData(ctl("a", 2.0, 40), data(4, "a", 3.0, 50)) // threshold lowered
      q.processAllAvailable()
      val passed = spark.table("t_bcast").as[Ev].collect().map(_.event_id).toSet
      assert(passed == Set(2L, 4L))
    } finally q.stop()
  }

  test("event-time sorted emission: out-of-order rows released in order once the watermark passes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ms = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val in = ms.toDS().toDF("key", "id", "ts")
      .withWatermark("ts", "5 seconds")
      .as[TimedRow]
    val q = StatefulOps.sortedEmit(in).toDF()
      .writeStream.format("memory").queryName("t_sortemit").outputMode("append").start()
    try {
      // batch 1: out of order; watermark still 0 → nothing emitted
      ms.addData((1L, 30L, t(30)), (1L, 10L, t(10)), (1L, 20L, t(20)))
      q.processAllAvailable()
      assert(spark.table("t_sortemit").count() == 0)
      // batch 2 runs with watermark = 30-5 = 25 (watermark trails one
      // batch) → releases 10, 20 in order; 30 still buffered
      ms.addData((1L, 100L, t(100)))
      q.processAllAvailable()
      assert(spark.table("t_sortemit").as[TimedRow].collect().map(_.id).toSeq == Seq(10L, 20L))
      // batch 3 runs with watermark = 100-5 = 95 → releases 30; the
      // t=100 row stays buffered (100 > 95)
      ms.addData((1L, 200L, t(200)))
      q.processAllAvailable()
      val got = spark.table("t_sortemit").as[TimedRow].collect().map(_.id).toSeq
      assert(got == Seq(10L, 20L, 30L))
    } finally q.stop()
  }

  test("dropDuplicates is streaming keep-first per key") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = ms.toDS().dropDuplicates("user_id").toDF()
      .writeStream.format("memory").queryName("t_keepfirst").outputMode("append").start()
    try {
      ms.addData(ev(1, 1, "a", 100))
      q.processAllAvailable()
      ms.addData(ev(2, 1, "b", 200), ev(3, 2, "c", 300)) // user 1 already seen
      q.processAllAvailable()
      val got = spark.table("t_keepfirst").as[Ev].collect().map(_.event_id).toSet
      assert(got == Set(1L, 3L))
    } finally q.stop()
  }
}

/** Shared batch/stream expression so the equivalence test compiles the
 * identical plan shape in both modes (SURVEY M2's t2 pattern). */
object StatefulOpsSpecHelper {
  import org.apache.spark.sql.DataFrame
  def tumbleCounts(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("cast(timestamp_micros(ts_us) as timestamp_ntz)"))
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100)).as("cents"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("cents"))
}
