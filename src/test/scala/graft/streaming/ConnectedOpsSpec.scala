package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class CsA(k: Long, t_us: Long, id: Long, amt: Long)
case class CsB(k: Long, t_us: Long, id: Long)
case class CsOut(k: Long, id: Long, n: Long, cents: Long)

/** ConnectedOps: the two-input keyed co-process (reference
 * ConnectedStreams.keyBy + KeyedCoProcessFunction) — shared per-key
 * state across two element types, event-time-ordered delivery with
 * side-1-first tie handling, cross-batch buffering under the
 * min-combined watermark, and the stateless CoFlatMap pair. */
class ConnectedOpsSpec extends SparkSuite {
  private val Sec = 1000000L
  private val Far = 7258118400000000L // ~2200-01-01

  private def enrich(a: MemoryStream[CsA], b: MemoryStream[CsB]) = {
    import spark.implicits._
    ConnectedOps.keyedCoProcessOrdered[CsA, CsB, (Long, Long), CsOut](
      a.toDS(), _.k, _.t_us, _.id,
      b.toDS(), _.k, _.t_us, _.id,
      zero = (0L, 0L),
      on1 = (_, st, x) => ((st._1 + 1, st._2 + x.amt), Nil),
      on2 = (k, st, y) => (st, Seq(CsOut(k, y.id, st._1, st._2))))
  }

  test("shared keyed state, ordered delivery, ties side-1-first, cross-batch buffering") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val a = MemoryStream[CsA]
    val b = MemoryStream[CsB]
    val q = enrich(a, b).toDF()
      .writeStream.format("memory").queryName("t_coproc")
      .outputMode("append").start()
    try {
      a.addData(CsA(1, 10 * Sec, 1, 5))
      b.addData(CsB(1, 12 * Sec, 100))
      q.processAllAvailable()
      // watermark = min(10s, 12s) = 10s → strict release frees nothing
      assert(spark.table("t_coproc").isEmpty, "released before the watermark passed")

      // a LATER batch delivers a side-1 row that TIES the buffered
      // side-2 row's timestamp — ordered delivery must still count it
      a.addData(CsA(1, 12 * Sec, 2, 7))
      b.addData(CsB(1, 30 * Sec, 101), CsB(2, 31 * Sec, 200))
      q.processAllAvailable()

      for (round <- 1 to 2) {
        a.addData(CsA(1, Far + round, -1, 0), CsA(2, Far + round, -1, 0))
        b.addData(CsB(1, Far + round, -1), CsB(2, Far + round, -1))
        q.processAllAvailable()
      }
      val out = spark.table("t_coproc").as[CsOut].collect().toSet
      assert(out == Set(
        CsOut(1, 100, 2, 12), // both clicks ≤ 12s, the tied one included (side 1 first)
        CsOut(1, 101, 2, 12),
        CsOut(2, 200, 0, 0)   // keys are isolated
      ), s"got $out")
    } finally q.stop()
  }

  test("fluent facade: Stream.connect routes to the same operators") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val a = MemoryStream[CsA]
    val b = MemoryStream[CsB]
    val out = new graft.api.Stream(a.toDS()).connect(new graft.api.Stream(b.toDS()))
      .keyedProcessOrdered[(Long, Long), CsOut](
        (_: CsA).k, _.t_us, _.id, (_: CsB).k, _.t_us, _.id,
        zero = (0L, 0L),
        on1 = (_, st, x) => ((st._1 + 1, st._2 + x.amt), Nil),
        on2 = (k, st, y) => (st, Seq(CsOut(k, y.id, st._1, st._2))))
    val q = out.toDF().writeStream.format("memory").queryName("t_cofacade")
      .outputMode("append").start()
    try {
      a.addData(CsA(1, 10 * Sec, 1, 5))
      b.addData(CsB(1, 20 * Sec, 100))
      q.processAllAvailable()
      for (round <- 1 to 2) {
        a.addData(CsA(1, Far + round, -1, 0))
        b.addData(CsB(1, Far + round, -1))
        q.processAllAvailable()
      }
      assert(spark.table("t_cofacade").as[CsOut].collect().toSet ==
        Set(CsOut(1, 100, 1, 5)))
    } finally q.stop()
  }

  test("coFlatMap is the stateless CoFlatMapFunction pair") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val a = MemoryStream[CsA]
    val b = MemoryStream[CsB]
    val out = ConnectedOps.coFlatMap[CsA, CsB, (String, Long)](
      a.toDS(), b.toDS(),
      x => if (x.amt > 0) Seq(("a", x.id)) else Nil,
      y => Seq(("b", y.id), ("b2", y.id)))
    val q = out.toDF().writeStream.format("memory").queryName("t_coflat")
      .outputMode("append").start()
    try {
      a.addData(CsA(1, Sec, 1, 5), CsA(1, Sec, 2, 0))
      b.addData(CsB(1, Sec, 100))
      q.processAllAvailable()
      val got = spark.table("t_coflat").as[(String, Long)].collect().toSet
      assert(got == Set(("a", 1L), ("b", 100L), ("b2", 100L)))
    } finally q.stop()
  }
}
