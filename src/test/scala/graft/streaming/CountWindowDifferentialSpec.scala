package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Differential fuzzer for [[CountSession.countWindow]] and
 * [[CountSession.countWindowSliding]]: random keyed timelines under
 * random (n) / (size, slide) parameters and random batch cuts must
 * equal a scalar chunking oracle over the complete (ts, id)-ordered
 * release sequence — the reference's countWindow(n) /
 * countWindow(size, slide) = GlobalWindow + CountEvictor +
 * CountTrigger semantics. The cross-batch risk under attack: the
 * released-count and open-accumulator state must chunk identically no
 * matter where the batch boundary lands. Strict-increase cuts, as in
 * the other streaming differentials. */
class CountWindowDifferentialSpec extends SparkSuite {

  private val FarUs = 4102444800000000L

  private def centsOf(e: Ev): Long = math.floor(e.value * 100).toLong

  private def mkCase(rnd: scala.util.Random): (Seq[Ev], Seq[Seq[Ev]], Int) = {
    val nKeys = 1 + rnd.nextInt(3)
    val n = 12 + rnd.nextInt(25)
    val evs = (1 to n).map { i =>
      Ev(i.toLong, 1 + rnd.nextInt(nKeys), "t",
        (1 + rnd.nextInt(10)) * 1000000L, rnd.nextInt(500) / 100.0)
    }
    val sorted = evs.sortBy(_.ts_us)
    val strictCuts = (1 until sorted.size)
      .filter(i => sorted(i - 1).ts_us < sorted(i).ts_us)
    val cuts = (Seq(0, sorted.size) ++ Seq.fill(1 + rnd.nextInt(3))(
      if (strictCuts.isEmpty) 0 else strictCuts(rnd.nextInt(strictCuts.size)))
    ).distinct.sorted
    val batches = cuts.sliding(2)
      .map(w => rnd.shuffle(sorted.slice(w.head, w.last))).toSeq.filter(_.nonEmpty)
    (evs, batches, nKeys)
  }

  private def runToMap(df: org.apache.spark.sql.DataFrame, name: String,
      in: MemoryStream[Ev], batches: Seq[Seq[Ev]], nKeys: Int): Array[org.apache.spark.sql.Row] = {
    val q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      // keyed sentinels, TWO rounds: round 1 advances the watermark
      // (visible only from the NEXT batch), round 2 invokes each key
      // again under the advanced mark — NoTimeout state functions are
      // only invoked for keys WITH input
      for (round <- 1 to 2) {
        (1 to nKeys).foreach(k =>
          in.addData(Ev(-round.toLong, k.toLong, "flush", FarUs + round, 0.0)))
        q.processAllAvailable()
      }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("tumbling count window equals the scalar chunking oracle under random cuts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 6) {
      val (evs, batches, nKeys) = mkCase(rnd)
      val n = 2 + rnd.nextInt(4)
      val expected = evs.groupBy(_.user_id).flatMap { case (k, ks) =>
        ks.sortBy(e => (e.ts_us, e.event_id)).grouped(n).zipWithIndex
          .filter(_._1.size == n) // trailing remainder never fires
          .map { case (w, i) => (k, i + 1L) -> (n.toLong, w.map(centsOf).sum) }
      }
      val in = MemoryStream[Ev]
      val rows = runToMap(CountSession.countWindow(in.toDS(), n).toDF(),
        s"t_cwdiff_$case_", in, batches, nKeys)
      val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got == expected,
        s"case $case_ (seed $seed): tumbling count window diverged [n=$n]\n" +
        s"  got=$got\n  want=$expected")
    }
  }

  test("sliding count window equals the scalar ring oracle under random cuts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = 99177L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 6) {
      val (evs, batches, nKeys) = mkCase(rnd)
      val size = 2 + rnd.nextInt(5)
      val slide = 1 + rnd.nextInt(4)
      val expected = evs.groupBy(_.user_id).flatMap { case (k, ks) =>
        val sorted = ks.sortBy(e => (e.ts_us, e.event_id))
        sorted.zipWithIndex.collect { case (_, i) if (i + 1) % slide == 0 =>
          val ring = sorted.slice(math.max(0, i + 1 - size), i + 1)
          (k, (i + 1L) / slide) -> (ring.size.toLong, ring.map(centsOf).sum)
        }
      }
      val in = MemoryStream[Ev]
      val rows = runToMap(CountSession.countWindowSliding(in.toDS(), size, slide).toDF(),
        s"t_csdiff_$case_", in, batches, nKeys)
      val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got == expected,
        s"case $case_ (seed $seed): sliding count window diverged " +
        s"[size=$size slide=$slide]\n  got=$got\n  want=$expected")
    }
  }
}
