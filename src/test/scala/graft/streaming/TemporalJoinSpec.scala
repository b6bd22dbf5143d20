package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dim version fixture for the generic temporal join. */
case class DimV(k: Long, t: Long, seq: Long, payload: Double)

/** Probe fixture for the generic temporal join. */
case class PrbV(k: Long, t: Long, id: Long)

/** Streaming temporal join: row-time hold-and-release, as-of tie rules,
 * late dim versions, and watermark retention of the version history. */
class TemporalJoinSpec extends SparkSuite {

  private val FarUs = 4102444800000000L // ~2100-01-01, advances the watermark

  private def run(dims: MemoryStream[DimV], probes: MemoryStream[PrbV],
      name: String, delay: String) = {
    TemporalJoin.runTyped(dims.toDS(), probes.toDS(),
      "k", "t", "seq", "k", "t", "id", delay).toDF()
  }

  test("probe matches the latest version at-or-before its time; released on watermark passage") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dims = MemoryStream[DimV]
    val probes = MemoryStream[PrbV]
    val q = run(dims, probes, "t_tj1", "0 seconds")
      .writeStream.format("memory").queryName("t_tj1").outputMode("append").start()
    try {
      dims.addData(DimV(1, 100, 1, 10.0), DimV(1, 200, 2, 20.0), DimV(1, 200, 3, 30.0))
      probes.addData(PrbV(1, 150, 101), PrbV(1, 200, 102), PrbV(1, 50, 103))
      q.processAllAvailable()
      // row-time: nothing may emit before the watermark passes the probes
      assert(spark.table("t_tj1").count() == 0,
        "row-time join emitted probes before the watermark passed them")
      probes.addData(PrbV(1, FarUs, -1)) // advance the watermark
      q.processAllAvailable()
      val out = spark.table("t_tj1")
        .select($"probe.id", $"dim.seq").as[(Long, Option[Long])].collect().toMap
      assert(out == Map(
        101L -> Some(1L),  // version at t=100
        102L -> Some(3L),  // same instant visible; seq tie → max seq
        103L -> None))     // before any version
    } finally q.stop()
  }

  test("late dim version below a held probe's time is joined (proc-time would miss it)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dims = MemoryStream[DimV]
    val probes = MemoryStream[PrbV]
    val q = run(dims, probes, "t_tj_late", "10 seconds")
      .writeStream.format("memory").queryName("t_tj_late").outputMode("append").start()
    try {
      val sec = 1000000L
      dims.addData(DimV(1, 1 * sec, 1, 10.0))
      probes.addData(PrbV(1, 5 * sec, 201))
      q.processAllAvailable() // wm = 0: probe held
      // v2 arrives in a LATER batch but with time below the held
      // probe's: row-time semantics must enrich the probe with v2
      dims.addData(DimV(1, 3 * sec, 2, 20.0))
      probes.addData(PrbV(1, FarUs, -1))
      q.processAllAvailable()
      val out = spark.table("t_tj_late")
        .select($"probe.id", $"dim.seq").as[(Long, Option[Long])].collect().toMap
      assert(out == Map(201L -> Some(2L)),
        s"held probe must see the late version 2, got $out")
    } finally q.stop()
  }

  test("watermark retention keeps only live dim versions in state") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val dims = MemoryStream[DimV]
    val probes = MemoryStream[PrbV]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tj_retain").toString
    val q = run(dims, probes, "t_tj_retain", "1 second")
      .writeStream.format("memory").queryName("t_tj_retain").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      val hourUs = 3600L * 1000000
      // +7us: an event time of exactly epoch 0 sits at the INITIAL
      // watermark and Spark's late-row filter drops it before the
      // operator — a fixture artifact, never a real event time
      (0 until 6).foreach { b =>
        dims.addData(DimV(1, b * hourUs + 7, b + 1, b * 10.0))
        probes.addData(PrbV(1, b * hourUs + 1000000, 100 + b))
        q.processAllAvailable()
      }
      probes.addData(PrbV(1, FarUs, -1)) // flush the held tail
      q.processAllAvailable()
      // every probe matched the version current at its time
      val out = spark.table("t_tj_retain").filter($"probe.id" >= 0)
        .select($"probe.id", $"dim.seq").as[(Long, Option[Long])].collect().toMap
      assert(out == (0 until 6).map(b => (100L + b) -> Some(b + 1L)).toMap)
      // 6 versions ingested; state keeps only versions above the
      // watermark plus the single newest at-or-before it
      val sizes = spark.read.format("statestore").load(ckpt)
        .select(size(col("value.groupState.dims"))).as[Int].collect()
      assert(sizes.nonEmpty && sizes.forall(_ <= 2),
        s"version history not watermark-pruned: ${sizes.toList}")
    } finally q.stop()
  }

  test("property: streaming temporal join equals the full-history as-of under random splits") {
    // randomized differential in the house style: random dim versions
    // and probes over a few keys, fed in ts-ordered blocks that never
    // split a ts-peer group across batches (the event-time-timeout
    // late-drop contract); the oracle is the full-history as-of rule —
    // per probe, the max-(t, seq) version of its key at or before its
    // time. Pins hold-and-release, cross-batch version buffering, and
    // the same-instant/seq tie rules under arbitrary interleavings.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 7919L)
      val dimsData = (1 to 10 + rnd.nextInt(10)).map(i =>
        DimV(1 + rnd.nextInt(3), (1 + rnd.nextInt(30)) * sec, i.toLong, i * 1.0))
      val probesData = (1 to 15 + rnd.nextInt(10)).map(i =>
        PrbV(1 + rnd.nextInt(3), (1 + rnd.nextInt(30)) * sec, 1000L + i))
      val want = probesData.map { p =>
        val vs = dimsData.filter(d => d.k == p.k && d.t <= p.t)
        p.id -> (if (vs.isEmpty) None else Some(vs.maxBy(d => (d.t, d.seq)).seq))
      }.toMap
      val dims = MemoryStream[DimV]
      val probes = MemoryStream[PrbV]
      val name = s"t_tj_diff_$seed"
      val q = run(dims, probes, name, "0 seconds")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // merge both sides, group by ts (peer groups never split),
        // then cut into random runs of whole groups
        val byTs = (dimsData.map(Left(_)) ++ probesData.map(Right(_)))
          .groupBy { case Left(d) => d.t; case Right(p) => p.t }
          .toSeq.sortBy(_._1).map(_._2)
        var i = 0
        while (i < byTs.length) {
          val n = 1 + rnd.nextInt(4)
          val block = byTs.slice(i, i + n).flatten
          val (ds, ps) = block.partitionMap(identity)
          if (ds.nonEmpty) dims.addData(ds: _*)
          if (ps.nonEmpty) probes.addData(ps: _*)
          q.processAllAvailable()
          i += n
        }
        dims.addData(DimV(99, FarUs, -1, 0.0))
        probes.addData(PrbV(99, FarUs, -1))
        q.processAllAvailable()
        val got = spark.table(name).filter($"probe.id" >= 0)
          .select($"probe.id", $"dim.seq").as[(Long, Option[Long])].collect().toMap
        assert(got == want,
          s"seed=$seed:\nmissing=${(want.toSet -- got.toSet).take(5)}" +
            s"\nextra=${(got.toSet -- want.toSet).take(5)}")
      } finally q.stop()
    }
  }
}
