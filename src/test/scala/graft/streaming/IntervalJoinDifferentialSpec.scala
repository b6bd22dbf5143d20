package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class IvL(k: Long, t: Long, id: Long)
case class IvR(k: Long, t: Long, id: Long)

/**
 * Randomized differential for the STREAM-STREAM interval join — the
 * operator behind `stream_interval_join{,_outer,_full}` (reference
 * StreamExecIntervalJoin): random keyed timelines and random
 * reach-back/reach-forward bounds, fed in ts-ordered blocks that never
 * split a ts-peer group (so no input ever lands below the global
 * watermark), checked against the in-memory batch range join. Covers
 * all three join types across seeds and pins the risky parts: state
 * admission/eviction at the exact range boundaries, and outer
 * null-extension timing (null rows flush one watermark advance AFTER
 * eviction — hence two sentinel rounds, the same contract as
 * StreamOps.eventsTypedWithFinalWatermark rounds = 2).
 */
class IntervalJoinDifferentialSpec extends SparkSuite {
  private val sec = 1000000L
  private val FarUs = 4102444800000000L // ~2100-01-01, advances the watermark

  test("property: streaming interval join (inner/left/full) equals the batch range join under random splits") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 104729L)
      val lo = rnd.nextInt(6).toLong * sec        // reach-back
      val hi = (1 + rnd.nextInt(20)).toLong * sec // reach-forward
      val joinType = Seq("inner", "left_outer", "full_outer")(seed % 3)
      val lData = (1 to 12 + rnd.nextInt(10)).map(i =>
        IvL(1 + rnd.nextInt(3), (1 + rnd.nextInt(40)) * sec, i.toLong))
      val rData = (1 to 12 + rnd.nextInt(10)).map(i =>
        IvR(1 + rnd.nextInt(3), (1 + rnd.nextInt(40)) * sec, 100L + i))
      def matches(l: IvL, r: IvR) =
        l.k == r.k && r.t >= l.t - lo && r.t <= l.t + hi
      val pairs = for (l <- lData; r <- rData if matches(l, r))
        yield (Option(l.id), Option(r.id))
      val lOnly = lData.filter(l => !rData.exists(r => matches(l, r)))
        .map(l => (Option(l.id), Option.empty[Long]))
      val rOnly = rData.filter(r => !lData.exists(l => matches(l, r)))
        .map(r => (Option.empty[Long], Option(r.id)))
      val want = (joinType match {
        case "inner"      => pairs
        case "left_outer" => pairs ++ lOnly
        case "full_outer" => pairs ++ lOnly ++ rOnly
      }).toSet

      val ls = MemoryStream[IvL]
      val rs = MemoryStream[IvR]
      val left = ls.toDF()
        .select(col("k").as("lk"), expr("timestamp_micros(t)").as("lt"),
          col("id").as("lid"))
        .withWatermark("lt", "0 seconds")
      val right = rs.toDF()
        .select(col("k").as("rk"), expr("timestamp_micros(t)").as("rt"),
          col("id").as("rid"))
        .withWatermark("rt", "0 seconds")
      val joined = left.join(right,
        expr(s"lk = rk AND rt >= lt - INTERVAL ${lo / sec} SECONDS" +
          s" AND rt <= lt + INTERVAL ${hi / sec} SECONDS"),
        joinType)
        .select(col("lid"), col("rid"))
      val name = s"t_ij_diff_$seed"
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val byTs = (lData.map(Left(_)) ++ rData.map(Right(_)))
          .groupBy { case Left(l) => l.t; case Right(r) => r.t }
          .toSeq.sortBy(_._1).map(_._2)
        var i = 0
        while (i < byTs.length) {
          val n = 1 + rnd.nextInt(4)
          val block = byTs.slice(i, i + n).flatten
          val (lRows, rRows) = block.partitionMap(identity)
          if (lRows.nonEmpty) ls.addData(lRows: _*)
          if (rRows.nonEmpty) rs.addData(rRows: _*)
          q.processAllAvailable()
          i += n
        }
        ls.addData(IvL(99, FarUs, -1)); rs.addData(IvR(99, FarUs, -1))
        q.processAllAvailable()
        ls.addData(IvL(99, FarUs + 3600L * sec, -2))
        rs.addData(IvR(99, FarUs + 3600L * sec, -2))
        q.processAllAvailable()
        val got = spark.table(name)
          .as[(Option[Long], Option[Long])].collect()
          .filterNot { case (a, b) => a.exists(_ < 0) || b.exists(_ < 0) }
          .toSet
        assert(got == want,
          s"seed=$seed type=$joinType lo=${lo / sec}s hi=${hi / sec}s\n" +
            s"missing=${(want -- got).take(8)}\nextra=${(got -- want).take(8)}")
      } finally q.stop()
    }
  }
}
