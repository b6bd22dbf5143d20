package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Bounded per-key state contracts (the STATE_AUDIT.md pin): for each
 * flagship stateful op, the per-key state surviving in the checkpoint
 * is a function of the WATERMARK-HORIZON occupancy only — quadrupling
 * the event count at the same time density must leave the final
 * per-key state identical. A per-key list that grows with total event
 * count would be a scale-killer invisible to wall-clock gates
 * (reference analog: RocksDB state-size monitoring). */
class StateSizeSpec extends SparkSuite {

  private val Sec = 1000000L

  /** Run `build` over a MemoryStream fed in `batchSize`-event batches
   * (watermark advances between batches), then return per-key sizes of
   * the named array state field read back from the checkpoint. */
  private def stateSizes(events: Seq[Ev], batchSize: Int, mode: String,
      build: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.DataFrame,
      arrayPath: String): (Long, Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sss").toString
    val q = build(in.toDS()).writeStream.format("memory")
      .queryName(StreamOps.freshName("sss"))
      .outputMode(mode).option("checkpointLocation", ckpt).start()
    try {
      events.grouped(batchSize).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val st = spark.read.format("statestore").load(ckpt)
    val row = st.agg(count(lit(1)), max(size(col(arrayPath)))).head()
    (row.getLong(0), row.get(1) match {
      case null => 0L
      case i: Int => i.toLong
      case l: Long => l
    })
  }

  private def ev(id: Long, key: Long, tsSec: Long, typ: String = "t") =
    Ev(id, key, typ, tsSec * Sec, 1.0)

  test("Top-N state per key stays at n regardless of event count") {
    def feed(n: Int) = (1 to n).map(i => ev(i.toLong, i % 4, i.toLong))
    def run(n: Int) = stateSizes(feed(n), 10, "update",
      ds => StatefulOps.topNByType(ds, 3).toDF(),
      "value.groupState.value")
    val (k1, m1) = run(40)
    val (k4, m4) = run(160)
    assert(m1 <= 3 && m4 <= 3, s"top-n buffer exceeded n: $m1 / $m4")
    assert(k1 == 1 && k4 == 1, s"keys: $k1 / $k4") // event_type is constant 't'
  }

  test("CEP buffer per key tracks the within horizon, not the event count") {
    // 1 event/sec/key, within = 30 s: the surviving buffer is the tail
    // horizon (~30 rows + the batch in flight), identical at 4x events
    val p = Cep.Pattern.begin("a", (_: Ev).event_type == "t")
      .followedBy("b", _.event_type == "never")
      .within(30L * Sec)
    def feed(n: Int) = (1 to n).map(i => ev(i.toLong, 1L, i.toLong))
    def run(n: Int) = stateSizes(feed(n), 25, "append",
      ds => Cep.runBoundBy(ds, p, "user_id", "ts_us", "event_id",
        watermarkDelay = "0 seconds").toDF(),
      "value.groupState.buffer")
    val (_, m1) = run(200)
    val (_, m4) = run(800)
    assert(m1 == m4, s"CEP buffer grew with event count: $m1 -> $m4")
    assert(m4 <= 30 + 25 + 1, s"CEP buffer exceeds horizon+batch bound: $m4")
  }

  test("allowed-lateness window state per key tracks (span+lateness)/size, not event count") {
    // windows of 10 s, lateness 20 s: open windows <= (10+20)/10 + the
    // in-flight batch's spread, identical at 4x events
    def feed(n: Int) = (1 to n).map(i => ev(i.toLong, i % 3, i.toLong))
    def run(n: Int) = stateSizes(feed(n), 30, "append",
      ds => LateCapture.tumbleWithLateness(ds, 10L * Sec, 20L * Sec).toDF(),
      "value.groupState.windows")
    val (k1, m1) = run(300)
    val (k4, m4) = run(1200)
    assert(k1 == 3 && k4 == 3)
    assert(m1 == m4, s"open windows grew with event count: $m1 -> $m4")
    assert(m4 <= 3 + 3 + 1, s"open windows exceed (size+lateness)/size bound: $m4")
  }

  test("per-record changelog pending buffer tracks the watermark lag, not the event count") {
    def feed(n: Int) = (1 to n).map(i => ev(i.toLong, i % 3, i.toLong))
    def run(n: Int) = stateSizes(feed(n), 30, "append",
      ds => StatefulOps.groupAggChangelogPerRecord(ds).toDF(),
      "value.groupState._1")
    val (_, m1) = run(300)
    val (_, m4) = run(1200)
    assert(m1 == m4, s"pending buffer grew with event count: $m1 -> $m4")
    assert(m4 <= 30 + 1, s"pending exceeds one batch above the watermark: $m4")
  }

  test("temporal join dim versions per key are watermark-pruned, not accumulated") {
    // dim versions arrive 1/sec; probes advance the watermark right
    // behind them: retained versions = latest-at-watermark + the few
    // still-future ones, identical at 4x versions
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def run(n: Int): Long = {
      val dimsIn = MemoryStream[graft.queries.OrderVer]
      val probesIn = MemoryStream[Ev]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_sss_tj").toString
      val joined = TemporalJoin.runTyped(dimsIn.toDS(), probesIn.toDS(),
        "o_custkey", "ts_us", "o_orderkey", "user_id", "ts_us", "event_id",
        watermarkDelay = "0 seconds")
      val q = joined.toDF().writeStream.format("memory")
        .queryName(StreamOps.freshName("sss_tj"))
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        (1 to n).grouped(25).foreach { g =>
          dimsIn.addData(g.map(i =>
            graft.queries.OrderVer(1L, i.toLong * Sec, i.toLong, i.toDouble)))
          probesIn.addData(g.map(i => ev(1000L + i, 1L, i.toLong)))
          q.processAllAvailable()
        }
      } finally q.stop()
      val st = spark.read.format("statestore").load(ckpt)
      st.agg(max(size(col("value.groupState.dims")))).head().getInt(0).toLong
    }
    val m1 = run(100)
    val m4 = run(400)
    assert(m1 == m4, s"dim versions grew with version count: $m1 -> $m4")
    assert(m4 <= 25 + 2, s"dim versions exceed watermark-pruned bound: $m4")
  }
}
