package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Arrival-order-invariance differential for the allowed-lateness
 * operators: with an unlimited lateness horizon nothing is ever too
 * late, so the FINAL image (each key's firings that no later
 * overlapping firing supersedes) must equal the batch answer for ANY
 * permutation and ANY batch cuts of the input — including fully
 * shuffled feeds where most rows arrive below the watermark. This is
 * the strongest form of the reference's allowed-lateness contract:
 * late merges/refires must converge to the order-free result. The
 * intermediate firing sequence is cut-dependent by design; only the
 * final image is asserted, against an independent scalar oracle. */
class LatenessDifferentialSpec extends SparkSuite {

  private val Sec = 1000000L
  private val FarUs = 7258118400000000L
  private val Huge = 300L * 365 * 86400 * Sec

  private def centsOf(e: Ev): Long = math.floor(e.value * 100).toLong

  private def feed(q: org.apache.spark.sql.streaming.StreamingQuery,
      in: MemoryStream[Ev], evs: Seq[Ev], nKeys: Int, rnd: scala.util.Random): Unit = {
    val shuffled = rnd.shuffle(evs)
    val nBatches = 1 + rnd.nextInt(5)
    val cuts = (Seq(0, shuffled.size) ++
      Seq.fill(nBatches - 1)(rnd.nextInt(shuffled.size + 1))).distinct.sorted
    cuts.sliding(2).map(w => shuffled.slice(w.head, w.last)).filter(_.nonEmpty)
      .foreach { b => in.addData(b); q.processAllAvailable() }
    for (round <- 1 to 2) {
      (1 to nKeys).foreach(k =>
        in.addData(Ev(-round.toLong, k.toLong, "flush", FarUs + round, 0.0)))
      q.processAllAvailable()
    }
  }

  test("session final image equals the batch islands under any arrival order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 8) {
      val nKeys = 1 + rnd.nextInt(3)
      val gapUs = (2 + rnd.nextInt(6)) * Sec
      val evs = (1 to 15 + rnd.nextInt(25)).map(i =>
        Ev(i.toLong, 1 + rnd.nextInt(nKeys), "t",
          (1 + rnd.nextInt(40)) * Sec, rnd.nextInt(500) / 100.0))

      // scalar island oracle over all rows
      val expected = evs.groupBy(_.user_id).flatMap { case (k, ks) =>
        val ts = ks.sortBy(e => (e.ts_us, e.event_id))
        val islands = ts.tail.foldLeft(List(List(ts.head))) { (acc, e) =>
          if (e.ts_us - acc.head.head.ts_us <= gapUs) (e :: acc.head) :: acc.tail
          else List(e) :: acc
        }
        islands.map { isl =>
          (k, isl.map(_.ts_us).min, isl.map(_.ts_us).max + gapUs,
            isl.size.toLong, isl.map(centsOf).sum)
        }
      }.toSet

      val in = MemoryStream[Ev]
      val name = s"t_latdiff_s$case_"
      val q = LateCapture.sessionWithLateness(in.toDS(), gapUs, Huge).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        feed(q, in, evs, nKeys, rnd)
        assert(spark.table(name).filter($"kind" === "late").isEmpty,
          "late capture fired under unlimited lateness")
        val all = spark.table(name)
          .filter($"kind" =!= "late")
          .select($"user_id", $"ws_us", $"we_us", $"emit_seq", $"n", $"sum_cents")
          .as[(Long, Long, Long, Long, Long, Long)].collect()
        val finals = all.filter { a =>
          !all.exists(b => b._1 == a._1 && b._4 > a._4 &&
            b._2 <= a._3 && a._2 <= b._3)
        }.map(r => (r._1, r._2, r._3, r._5, r._6)).toSet
        assert(finals == expected,
          s"case $case_ (seed $seed, gap=${gapUs / Sec}s): final session image " +
          s"diverged from the batch islands\n  got=$finals\n  want=$expected")
      } finally q.stop()
    }
  }

  test("tumbling final image equals the batch aggregate under any arrival order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = 8891L
    val rnd = new scala.util.Random(seed)
    val sizeUs = 10 * Sec
    for (case_ <- 0 until 6) {
      val nKeys = 1 + rnd.nextInt(3)
      val evs = (1 to 15 + rnd.nextInt(25)).map(i =>
        Ev(i.toLong, 1 + rnd.nextInt(nKeys), "t",
          (1 + rnd.nextInt(40)) * Sec, rnd.nextInt(500) / 100.0))
      val expected = evs.groupBy(e => (e.user_id, e.ts_us / sizeUs * sizeUs))
        .map { case ((k, ws), g) => (k, ws, g.size.toLong, g.map(centsOf).sum) }.toSet

      val in = MemoryStream[Ev]
      val name = s"t_latdiff_t$case_"
      val q = LateCapture.tumbleWithLateness(in.toDS(), sizeUs, Huge).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        feed(q, in, evs, nKeys, rnd)
        val all = spark.table(name)
          .filter($"kind" =!= "late")
          .select($"user_id", $"ws_us", $"fire_seq", $"n", $"sum_cents")
          .as[(Long, Long, Long, Long, Long)].collect()
        val finals = all.groupBy(r => (r._1, r._2)).map { case ((k, ws), g) =>
          val last = g.maxBy(_._3)
          (k, ws, last._4, last._5)
        }.toSet
        assert(finals == expected,
          s"case $case_ (seed $seed): final window image diverged from the " +
          s"batch aggregate\n  got=$finals\n  want=$expected")
      } finally q.stop()
    }
  }
}
