package graft.rules

import graft.SparkSuite
import graft.streaming.Ev
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_micros}

/** Differential fuzzer for [[StreamOverAggRule]]: on random keyed
 * event sequences (with deliberate event-time TIES) and random
 * per-expression frame combinations, the streaming rewrite fed in
 * ts-ordered micro-batch blocks must equal Spark's own BATCH Window
 * over the identical rows — the reference's streaming/batch
 * consistency contract for OVER aggregation (StreamExecOverAggregate
 * vs the batch window operator). Randomized like the MATCH_RECOGNIZE
 * regex differential: the oracle is an independent engine path, not a
 * hand-computed expectation. */
class StreamOverDifferentialSpec extends SparkSuite {

  // one aggregate expression template per supported function; %F is
  // replaced with the frame clause
  private val aggPool = Vector(
    "count(*) OVER (PARTITION BY user_id ORDER BY __event_ts %F)",
    "sum(cents) OVER (PARTITION BY user_id ORDER BY __event_ts %F)",
    "min(cents) OVER (PARTITION BY user_id ORDER BY __event_ts %F)",
    "max(cents) OVER (PARTITION BY user_id ORDER BY __event_ts %F)",
    "avg(cents) OVER (PARTITION BY user_id ORDER BY __event_ts %F)",
    "first_value(cents) OVER (PARTITION BY user_id ORDER BY __event_ts %F)",
    "last_value(event_type) OVER (PARTITION BY user_id ORDER BY __event_ts %F)")

  private val framePool = Vector(
    "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
    "RANGE BETWEEN INTERVAL '2' SECOND PRECEDING AND CURRENT ROW",
    "RANGE BETWEEN INTERVAL '5' SECOND PRECEDING AND CURRENT ROW",
    // RANGE UNBOUNDED: peer groups share the frame in BOTH engines.
    // ROWS UNBOUNDED is deliberately absent: with ts ties its batch
    // result depends on Spark's arbitrary intra-peer order, which the
    // streaming operator (arrival order) legitimately need not match;
    // the deterministic tie case is pinned in StreamOverAggRuleSpec.
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")

  // ROWS bounded frames also depend on intra-peer order under ties —
  // pair them only with tie-free timelines; RANGE frames are
  // tie-robust (peers share the frame) and get tied timelines.
  private def tieRobust(frame: String): Boolean = frame.startsWith("RANGE")

  test("streaming OVER rewrite equals batch Window on random frames and timelines") {
    implicit val sqlCtx = spark.sqlContext
    implicit val evEnc: org.apache.spark.sql.Encoder[Ev] =
      org.apache.spark.sql.Encoders.product[Ev]
    val seed = 20260814L
    val rnd = new scala.util.Random(seed)
    val types = Vector("a", "b", "c")
    for (case_ <- 0 until 12) {
      val frames = Vector.fill(1 + rnd.nextInt(2))(framePool(rnd.nextInt(framePool.size)))
      val allowTies = frames.forall(tieRobust)
      val nRows = 20 + rnd.nextInt(30)
      // timestamps in whole seconds over ~15s; ties only when allowed
      val tss =
        if (allowTies) Vector.fill(nRows)((1 + rnd.nextInt(15)) * 1000000L)
        else rnd.shuffle((1 to nRows).toVector).map(_ * 1000000L)
      val rows = (0 until nRows).map { i =>
        Ev(i.toLong, 1 + rnd.nextInt(3), types(rnd.nextInt(3)), tss(i),
          (rnd.nextInt(2000) + 1) / 100.0)
      }
      val exprs = frames.zipWithIndex.map { case (f, i) =>
        aggPool(rnd.nextInt(aggPool.size)).replace("%F", f) + s" AS agg_$i"
      }
      val select = s"""
        SELECT user_id, event_id, ${exprs.mkString(",\n               ")}
        FROM (SELECT user_id, event_id, event_type, __event_ts,
                     CAST(floor(value * 100) AS BIGINT) AS cents FROM %VIEW%)"""

      // batch oracle: identical SQL over the same rows
      import spark.implicits._
      rows.toDS().toDF()
        .withColumn("__event_ts", timestamp_micros(col("ts_us")))
        .createOrReplaceTempView("over_diff_batch")
      val expect = spark.sql(select.replace("%VIEW%", "over_diff_batch"))
        .collect().map(_.toSeq).toSet

      // streaming: ts-ordered blocks (no late data), sentinel flush
      val ms = MemoryStream[Ev]
      val view = s"over_diff_stream_$case_"
      ms.toDF()
        .withColumn("__event_ts", timestamp_micros(col("ts_us")))
        .withWatermark("__event_ts", "0 seconds")
        .createOrReplaceTempView(view)
      val analyzed = spark.sql(select.replace("%VIEW%", view))
        .queryExecution.analyzed
      val rewritten = StreamOverAggRule(spark)(analyzed)
      assert(rewritten.collectFirst { case w: Window => w }.isEmpty,
        s"case $case_: rule did not fire for frames $frames")
      val q = org.apache.spark.sql.graft.SqlShim.ofRows(spark, rewritten)
        .writeStream.format("memory").queryName(s"t_overdiff_$case_")
        .outputMode("append").start()
      try {
        // blocks are ts-ordered AND never split a ts-peer group: a
        // peer arriving after the watermark reached its timestamp is
        // LATE by the operator's contract (Spark's event-time-timeout
        // state op drops rows at/below the watermark, as does the
        // reference's row-time OVER function) — the differential
        // feeds only on-time data
        val peerGroups = rows.sortBy(e => (e.ts_us, e.event_id))
          .foldLeft(Vector.empty[Vector[Ev]]) { (acc, e) =>
            if (acc.nonEmpty && acc.last.head.ts_us == e.ts_us)
              acc.init :+ (acc.last :+ e)
            else acc :+ Vector(e)
          }
        val per = math.max(1, peerGroups.size / (2 + rnd.nextInt(2)))
        val blocks = peerGroups.grouped(per).map(_.flatten).toList
        blocks.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
        ms.addData(Ev(-1L, -1L, "s", 999999L * 1000000, 0.0))
        q.processAllAvailable()
        val got = spark.table(s"t_overdiff_$case_")
          .filter(col("user_id") >= 0).collect().map(_.toSeq).toSet
        assert(got == expect,
          s"case $case_ (frames=$frames, rows=$nRows, ties=$allowTies):\n" +
            s"missing=${(expect -- got).take(5)}\nextra=${(got -- expect).take(5)}")
      } finally q.stop()
    }
  }
}
