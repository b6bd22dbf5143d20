package graft.api

import graft.SparkSuite
import graft.streaming.{Cep, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The SURVEY §7.1 fluent facade: env → stream → keyed → state op, and
 * the TableEnv SQL routing — thin wrappers whose results must equal the
 * operator objects they route to. */
class FlinkLikeEnvSpec extends SparkSuite {

  private def ev(id: Long, user: Long, typ: String, tsUs: Long, v: Double) =
    Ev(id, user, typ, tsUs, v)

  test("typed transforms compose and equal the direct Dataset chain") {
    import spark.implicits._
    val env = StreamEnv.get(spark)
    val out = env.fromDataset(Seq(1, 2, 3, 4, 5).toDS())
      .map(_ * 2)
      .filter(_ > 4)
      .flatMap(x => Seq(x, x + 1))
      .mapPartitions(it => it.map(_.toLong))
      .ds.collect().sorted.toList
    assert(out == List(6L, 7L, 8L, 9L, 10L, 11L))
  }

  test("fromElements/fromCollection/addSource feed the typed surface") {
    import spark.implicits._
    val env = StreamEnv.get(spark)
    assert(env.fromElements(3, 1, 2).ds.collect().sorted.toList == List(1, 2, 3))
    assert(env.fromCollection(Seq("a", "b")).ds.count() == 2)
    // SourceFunction: single-task push loop, elements distribute after
    val src = new SourceFunction[Ev] {
      def run(ctx: SourceFunction.SourceContext[Ev]): Unit =
        (1L to 5L).foreach(i => ctx.collect(ev(i, i % 2, "click", i * 1000000, i.toDouble)))
    }
    val out = env.addSource(src).filter(_.user_id == 1).ds.collect()
    assert(out.map(_.event_id).sorted.toList == List(1L, 3L, 5L))
  }

  test("keyBy.keepLast and keyBy.topN route to the state ops") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val env = StreamEnv.get(spark)
    val ms = MemoryStream[Ev]
    ms.addData(
      ev(1, 1, "a", 1000, 0.3), ev(2, 1, "a", 2000, 0.9),
      ev(3, 2, "b", 1500, 0.7), ev(4, 2, "b", 1400, 0.95))
    val q = env.fromDataset(ms.toDS()).keyBy("user_id")
      .keepLast("ts_us", "event_id").toDF()
      .writeStream.format("memory").queryName("fl_keeplast").outputMode("update").start()
    try {
      q.processAllAvailable()
      val winners = spark.table("fl_keeplast").as[Ev].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.ts_us).event_id }
      assert(winners == Map(1L -> 2L, 2L -> 3L))
    } finally q.stop()

    val ms2 = MemoryStream[Ev]
    ms2.addData(
      ev(1, 1, "a", 1000, 0.1), ev(2, 1, "a", 2000, 0.9),
      ev(3, 1, "a", 3000, 0.5), ev(4, 1, "a", 4000, 0.7))
    val q2 = env.fromDataset(ms2.toDS()).keyBy("event_type")
      .topN("value", "event_id", n = 2).toDF()
      .writeStream.format("memory").queryName("fl_topn").outputMode("update").start()
    try {
      q2.processAllAvailable()
      val emitted = spark.table("fl_topn").as[Ev].collect().map(_.event_id).toSet
      // the final top-2 (ids 2, 4) is always in the update stream
      assert(Set(2L, 4L).subsetOf(emitted))
    } finally q2.stop()
  }

  test("keyBy.cep routes to the NFA with full bindings") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val env = StreamEnv.get(spark)
    val ms = MemoryStream[Ev]
    ms.addData(
      ev(1, 1, "click", 1000, 1.0), ev(2, 1, "purchase", 2000, 1.0),
      ev(3, 2, "click", 1000, 1.0), ev(4, 2, "view", 2000, 1.0))
    val pattern = Cep.Pattern.of[Ev]("c", _.event_type == "click")
      .next("b", _.event_type == "purchase")
      .within(60L * 1000000)
    val q = env.fromDataset(ms.toDS()).keyBy("user_id")
      .cep(pattern, "ts_us", "event_id").select
      .map(b => (b.key, b.binds.head.ev.event_id, b.binds.last.ev.event_id))
      .toDF("k", "c_id", "b_id")
      .writeStream.format("memory").queryName("fl_cep").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("fl_cep").as[(String, Long, Long)].collect().toSet
      assert(rows == Set(("1", 1L, 2L)))
    } finally q.stop()
  }

  test("TableEnv: DDL registers a view; sqlQuery routes FOR SYSTEM_TIME") {
    import spark.implicits._
    val te = StreamEnv.get(spark).tableEnv
    val csv = java.nio.file.Files.createTempDirectory("fl_te").resolve("t.csv")
    java.nio.file.Files.writeString(csv, "7,x\n8,y\n")
    te.executeSql(s"""
      CREATE TABLE fl_te_t (id BIGINT, name STRING)
      WITH ('connector' = 'filesystem', 'path' = '$csv', 'format' = 'csv')""")
    assert(te.sqlQuery("SELECT sum(id) FROM fl_te_t").as[Long].head() == 15L)
    // FOR SYSTEM_TIME routes through the temporal-join pipeline — on an
    // unregistered versioned table it must fail with ITS error, not a
    // Spark parse error
    val err = intercept[IllegalArgumentException] {
      te.sqlQuery("SELECT * FROM p JOIN dims_unreg FOR SYSTEM_TIME AS OF p.ts AS d ON p.k = d.k")
    }
    assert(err.getMessage.contains("registerVersioned"))
  }

  test("TableEnv: changelog bridging round-trips (FLIP-136 from/toChangelogStream)") {
    import spark.implicits._
    val te = StreamEnv.get(spark).tableEnv
    val history = Seq(
      (1L, 1L, "a"), (1L, 2L, "a2"), // key 1: two versions
      (2L, 1L, "b")                  // key 2: one version
    ).toDF("k", "ver", "v")
    val cl = te.toChangelogStream(history, Seq("k"), "ver")
    // +I per key + one -U/+U pair for key 1's second version
    val kinds = cl.groupBy("row_kind").count().as[(String, Long)].collect().toMap
    assert(kinds == Map("+I" -> 2L, "-U" -> 1L, "+U" -> 1L), s"got $kinds")
    // normalize back: the latest image per key
    val img = te.fromChangelogStream(cl, Seq("k"), "ver")
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(img == Set((1L, "a2"), (2L, "b")))
  }

  test("TableEnv: executeSql is the single door — queries, TVF text, and DDL dispatch") {
    import spark.implicits._
    val te = StreamEnv.get(spark).tableEnv
    // plain query through executeSql (not just DDL)
    assert(te.executeSql("SELECT 1 + 1 AS two").as[Int].head() == 2)
    // window TVF text through the same door
    Seq(("2024-01-01 00:05:00", 1L), ("2024-01-01 00:20:00", 2L))
      .toDF("ts_s", "v")
      .selectExpr("cast(ts_s as timestamp) AS ts", "v")
      .createOrReplaceTempView("fl_tvf_in")
    val win = te.executeSql("""
      SELECT window_start, count(*) AS n
      FROM TABLE(TUMBLE(TABLE fl_tvf_in, DESCRIPTOR(ts), INTERVAL '15' MINUTE))
      GROUP BY window_start ORDER BY window_start""")
    assert(win.select("n").as[Long].collect().toSeq == Seq(1L, 1L))
    // INSERT INTO dispatches to the DDL layer, not spark.sql
    val errIns = intercept[IllegalArgumentException] {
      te.executeSql("INSERT INTO fl_never_declared SELECT 1")
    }
    assert(errIns.getMessage.contains("not a declared connector table"))
  }

  test("PatternStream: main, timed-out, and late channels split the operator output") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val sec = 1000000L
    val pat = Cep.Pattern.begin("a", (_: Ev).event_type == "a")
      .followedBy("b", _.event_type == "b")
      .within(50 * sec)
    val ms = MemoryStream[Ev]
    val ps = StreamEnv.get(spark).fromDataset(ms.toDS())
      .keyBy("user_id")
      .cep(pat, "ts_us", "event_id", watermarkDelay = "0 seconds",
        timedOut = true, lateCapture = true)
    val q = ps.all.toDF().writeStream.format("memory")
      .queryName("t_fl_ps").outputMode("append").start()
    try {
      // a@0 matches b@10; a@20 never completes; batch 3's c@30 is LATE
      ms.addData(ev(1, 1, "a", 0, 1.0), ev(2, 1, "b", 10 * sec, 1.0),
        ev(3, 1, "a", 20 * sec, 1.0))
      q.processAllAvailable()
      ms.addData(ev(4, 1, "x", 100 * sec, 1.0)) // wm 20s
      q.processAllAvailable()
      ms.addData(ev(5, 1, "c", 30 * sec, 1.0),  // below 100−50 → late
        ev(6, 1, "x", 200 * sec, 1.0))          // wm 100s evicts a@20
      q.processAllAvailable()
      val all = spark.table("t_fl_ps").as[graft.streaming.CepBoundG[Ev]]
      def ids(f: org.apache.spark.sql.Dataset[graft.streaming.CepBoundG[Ev]]) =
        f.collect().map(_.binds.map(b => (b.step, b.ev.event_id)).toList).toList
      val ps2 = new PatternStream(all)
      assert(ids(ps2.select) == List(List(("a", 1L), ("b", 2L))))
      assert(ids(ps2.timedOutPartials) ==
        List(List((Cep.TimedOutStep + ":a", 3L))))
      assert(ids(ps2.lateData) == List(List((Cep.LateStep, 5L))))
    } finally q.stop()
  }
}
