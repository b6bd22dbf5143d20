package graft.streaming

import graft.SparkSuite
import graft.changelog.ChangelogOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized multi-batch differential for [[RetractJoin]]: random
 * upsert sequences on both sides, split across random micro-batch
 * boundaries, must (a) normalize to the inner join of each side's
 * latest images after EVERY batch — the reference
 * StreamingJoinOperator's contract that the emitted changelog always
 * materializes to the true join — and (b) stay well-formed per key
 * (+I first, then alternating -U/+U, net live count 0 or 1). The
 * oracle is a driver-side replay; batch boundaries are the adversarial
 * input (cross-batch state resumption, not within-batch ordering). */
class RetractJoinDifferentialSpec extends SparkSuite {

  test("streaming retract join normalizes to the latest-image join after every batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    for (case_ <- 0 until 5) {
      val nKeys = 1 + rnd.nextInt(4)
      val nOps = 20 + rnd.nextInt(20)
      var seq = 0L
      val ops = (0 until nOps).map { i =>
        seq += 1
        RjInput(isLeft = rnd.nextBoolean(), rnd.nextInt(nKeys).toLong,
          time_us = i.toLong * 1000, seq = seq,
          payload = (rnd.nextInt(900) + 100) / 10.0)
      }
      // 2–4 batches at random cut points
      val cuts = (Seq(0, nOps) ++ Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(nOps)))
        .distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => ops.slice(a, b) }
        .filter(_.nonEmpty)

      val ms = MemoryStream[RjInput]
      val sink = s"t_rjdiff_$case_"
      val q = RetractJoin.run(ms.toDS()).toDF()
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        var applied = Vector.empty[RjInput]
        for (batch <- batches) {
          ms.addData(batch: _*)
          q.processAllAvailable()
          applied ++= batch
          // driver replay: latest image per (side, key)
          val leftImg = applied.filter(_.isLeft).groupBy(_.key)
            .map { case (k, rs) => k -> rs.maxBy(r => (r.time_us, r.seq)) }
          val rightImg = applied.filterNot(_.isLeft).groupBy(_.key)
            .map { case (k, rs) => k -> rs.maxBy(r => (r.time_us, r.seq)) }
          val expected = leftImg.keySet.intersect(rightImg.keySet).map { k =>
            (k, Some(leftImg(k).seq), Some(leftImg(k).payload),
              Some(rightImg(k).payload))
          }.toSet
          val got = ChangelogOps.normalize(spark.table(sink), Seq("key"), "out_seq")
            .select("key", "left_seq", "left_payload", "right_payload")
            .as[(Long, Option[Long], Option[Double], Option[Double])]
            .collect().toSet
          assert(got == expected,
            s"case $case_ after ${applied.size} ops: join image diverged\n" +
            s" got $got\n exp $expected")
        }
        // changelog well-formedness per key over the whole run
        val rows = spark.table(sink).as[RjChange].collect()
          .groupBy(_.key).values
        for (keyRows <- rows) {
          val kinds = keyRows.sortBy(_.out_seq).map(_.row_kind).toList
          assert(kinds.head == "+I", s"case $case_: first emission not +I: $kinds")
          val net = kinds.map {
            case "+I" | "+U" => 1; case "-U" | "-D" => -1
          }.sum
          assert(net == 1, s"case $case_: net live count $net for $kinds")
          kinds.sliding(2).foreach {
            case List(a, b) =>
              assert(!(a == "-U" && b == "-U") && !(Set("+I", "+U")(a) && Set("+I", "+U")(b)),
                s"case $case_: non-alternating changelog $kinds")
            case _ =>
          }
        }
      } finally q.stop()
    }
  }
}
