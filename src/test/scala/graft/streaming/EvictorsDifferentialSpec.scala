package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized differential for the three evictor analogs
 * (CountEvictor.java / TimeEvictor.java:69-84 /
 * DeltaEvictor.java:74-83): random event sets cut into random ordered
 * micro-batches, window results checked against scalar simulators of
 * the keep-last-N / trailing-span / within-threshold-of-final-last
 * contracts. The eager bounded-buffer (count), monotone-cutoff (time),
 * and full-pane (delta) state strategies must all be invisible in the
 * output — the fuzzed axis is the batch boundary falling between a
 * window's rows and its close. */
class EvictorsDifferentialSpec extends SparkSuite {

  private val secUs = 1000000L
  private val minUs = 60L * secUs
  private val sizeUs = 10 * minUs

  private case class R(key: String, user: Long, ts: Long, id: Long, cents: Long, v: Double)

  private def genBatches(rnd: scala.util.Random): List[List[R]] = {
    val keys = Vector("a", "b")
    val n = 14 + rnd.nextInt(14)
    val rows = (0 until n).map { i =>
      val v = (1 + rnd.nextInt(50)) / 10.0
      R(keys(rnd.nextInt(2)), 1 + rnd.nextInt(2), rnd.nextInt(2400) * secUs,
        i + 1, math.floor(v * 100).toLong, v)
    }.sortBy(r => (r.ts, r.id)).toList
    val marks = (0 until 2 + rnd.nextInt(4)).map(_ => rnd.nextInt(n + 1)).sorted
    ((0 +: marks :+ n).distinct.sliding(2).map {
      case Seq(a, b) => rnd.shuffle(rows.slice(a, b))
    }).filter(_.nonEmpty).toList
  }

  private def runStream[T](batches: List[List[R]], name: String)(
      mk: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.Dataset[T]): Unit = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Ev]
    val q = mk(ms.toDS()).toDF().writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      batches.foreach { b =>
        ms.addData(b.map(r => Ev(r.id, r.user, r.key, r.ts, r.v)))
        q.processAllAvailable()
      }
      for (round <- 1 to 2) {
        ms.addData(
          Ev(-1, 1, "a", (100000 + round) * minUs, 0.0),
          Ev(-1, 2, "a", (100000 + round) * minUs, 0.0),
          Ev(-1, 1, "b", (100000 + round) * minUs, 0.0),
          Ev(-1, 2, "b", (100000 + round) * minUs, 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("count evictor equals keep-last-N on random batch cuts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260820L)
    for (case_ <- 0 until 4) {
      val keep = 2 + rnd.nextInt(3)
      val batches = genBatches(rnd)
      runStream(batches, "t_cevict_fuzz")(
        ds => Evictors.tumbleCountEvictor(ds, sizeUs, keep))
      val got = spark.table("t_cevict_fuzz").as[EvictWinRow].collect()
        .map(r => (r.user_id, r.ws_us, r.n_kept, r.kept_cents)).toSet
      // count evictor keys by user_id only — regroup the sim that way
      val want = batches.flatten.groupBy(r =>
          (r.user, Math.floorDiv(r.ts, sizeUs) * sizeUs)).map {
        case ((user, ws), rows) =>
          val kept = rows.sortBy(r => (r.ts, r.id)).takeRight(keep)
          (user, ws, kept.size.toLong, kept.map(_.cents).sum)
      }.toSet
      assert(got == want, s"case $case_ keep=$keep: got $got want $want")
      spark.sql("DROP TABLE IF EXISTS t_cevict_fuzz")
    }
  }

  test("time evictor equals the trailing-span rule on random batch cuts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260821L)
    for (case_ <- 0 until 4) {
      val keepUs = Vector(2, 3, 5)(rnd.nextInt(3)) * minUs
      val batches = genBatches(rnd)
      runStream(batches, "t_tevict_fuzz")(
        ds => Evictors.tumbleTimeEvictor(ds, sizeUs, keepUs))
      val got = spark.table("t_tevict_fuzz").as[EvictTypeWinRow].collect()
        .map(r => (r.event_type, r.ws_us, r.n_kept, r.kept_cents)).toSet
      val want = batches.flatten.groupBy(r =>
          (r.key, Math.floorDiv(r.ts, sizeUs) * sizeUs)).map {
        case ((key, ws), rows) =>
          val cutoff = rows.map(_.ts).max - keepUs
          val kept = rows.filter(_.ts > cutoff)
          (key, ws, kept.size.toLong, kept.map(_.cents).sum)
      }.toSet
      assert(got == want, s"case $case_ keep=$keepUs: got $got want $want")
      spark.sql("DROP TABLE IF EXISTS t_tevict_fuzz")
    }
  }

  test("delta evictor equals within-threshold-of-final-last on random batch cuts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260822L)
    for (case_ <- 0 until 4) {
      val thr = Vector(50L, 100L, 200L)(rnd.nextInt(3))
      val batches = genBatches(rnd)
      runStream(batches, "t_devict_fuzz")(
        ds => Evictors.tumbleDeltaEvictor(ds, sizeUs, thr))
      val got = spark.table("t_devict_fuzz").as[EvictTypeWinRow].collect()
        .map(r => (r.event_type, r.ws_us, r.n_kept, r.kept_cents)).toSet
      val want = batches.flatten.groupBy(r =>
          (r.key, Math.floorDiv(r.ts, sizeUs) * sizeUs)).map {
        case ((key, ws), rows) =>
          val lastCents = rows.maxBy(r => (r.ts, r.id)).cents
          val kept = rows.filter(r => math.abs(r.cents - lastCents) < thr)
          (key, ws, kept.size.toLong, kept.map(_.cents).sum)
      }.toSet
      assert(got == want, s"case $case_ thr=$thr: got $got want $want")
      spark.sql("DROP TABLE IF EXISTS t_devict_fuzz")
    }
  }
}
