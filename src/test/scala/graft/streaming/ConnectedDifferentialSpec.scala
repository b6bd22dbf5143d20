package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized differential for the keyed connected-streams co-process:
 * random two-sided keyed timelines (with cross-side timestamp ties)
 * fed in ts-ordered blocks that never split a ts-peer group across
 * either stream, checked against the scalar oracle — each side-2
 * element observes the fold of all same-key side-1 elements with
 * ts at-or-before its own (side 1 wins ties). Pins the strict-release
 * boundary, cross-batch buffering under the min-combined watermark,
 * and the deterministic (ts, side, id) delivery order. */
class ConnectedDifferentialSpec extends SparkSuite {
  private val Sec = 1000000L
  private val Far = 7258118400000000L

  test("property: ordered co-process equals the scalar at-or-before fold under random splits") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 7919L)
      val nKeys = 1 + rnd.nextInt(3)
      val as = (1 to 8 + rnd.nextInt(10)).map(i =>
        CsA(1 + rnd.nextInt(nKeys), (1 + rnd.nextInt(25)) * Sec, i.toLong,
          1 + rnd.nextInt(9)))
      val bs = (1 to 8 + rnd.nextInt(10)).map(i =>
        CsB(1 + rnd.nextInt(nKeys), (1 + rnd.nextInt(25)) * Sec, 100L + i))

      val expected = bs.map { y =>
        val seen = as.filter(x => x.k == y.k && x.t_us <= y.t_us)
        CsOut(y.k, y.id, seen.size.toLong, seen.map(_.amt).sum)
      }.toSet

      val a = MemoryStream[CsA]
      val b = MemoryStream[CsB]
      val out = ConnectedOps.keyedCoProcessOrdered[CsA, CsB, (Long, Long), CsOut](
        a.toDS(), _.k, _.t_us, _.id,
        b.toDS(), _.k, _.t_us, _.id,
        zero = (0L, 0L),
        on1 = (_, st, x) => ((st._1 + 1, st._2 + x.amt), Nil),
        on2 = (k, st, y) => (st, Seq(CsOut(k, y.id, st._1, st._2))))
      val name = s"t_codiff_$seed"
      val q = out.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // ts-ordered blocks, cut only at distinct-ts boundaries so no
        // row ever lands at-or-below the already-advanced watermark
        val allTs = (as.map(_.t_us) ++ bs.map(_.t_us)).distinct.sorted
        var blocks = List(allTs)
        while (rnd.nextBoolean() && blocks.head.size > 1) {
          val cut = 1 + rnd.nextInt(blocks.head.size - 1)
          blocks = blocks.head.take(cut) :: blocks.head.drop(cut) :: blocks.tail
        }
        // `blocks` is already chronological: each split divides the
        // current head (earliest segment) in place
        blocks.foreach { tsBlock =>
          val tset = tsBlock.toSet
          val aBlk = as.filter(x => tset.contains(x.t_us))
          val bBlk = bs.filter(y => tset.contains(y.t_us))
          if (aBlk.nonEmpty) a.addData(aBlk)
          if (bBlk.nonEmpty) b.addData(bBlk)
          q.processAllAvailable()
        }
        for (round <- 1 to 2) {
          (1 to nKeys).foreach { k =>
            a.addData(CsA(k.toLong, Far + round, -1, 0))
            b.addData(CsB(k.toLong, Far + round, -1))
          }
          q.processAllAvailable()
        }
        val got = spark.table(name).as[CsOut].collect().toSet
        assert(got == expected, s"seed $seed: got $got\nexpected $expected")
      } finally q.stop()
    }
  }
}
