package graft.rules

import graft.SparkSuite
import graft.sqlx.TemporalSql
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.catalyst.plans.logical.Join

/** FOR SYSTEM_TIME AS OF: the desugar produces the marker-conjunct
 * join, the analysis rule plans the marked streaming join into the
 * versioned-join state op, and the composed pipeline computes
 * latest-version-at-or-before enrichment over MemoryStreams. */
case class TjrDim(k: Long, ver_us: Long, seq: Long, price: Double)
case class TjrProbe(id: Long, k: Long, ts_us: Long)

class TemporalJoinRuleSpec extends SparkSuite {

  test("desugar rewrites the clause and demands versioned registration") {
    TemporalSql.registerVersioned("dims_v", "ver_us", "seq")
    val out = TemporalSql.desugar(
      """SELECT p.id, d.price FROM probes p
         JOIN dims_v FOR SYSTEM_TIME AS OF p.ts_us AS d ON p.k = d.k
         WHERE p.id > 0""")
    assert(out.contains("dims_v AS d"))
    assert(out.toUpperCase.contains("SYSTEM_TIME_AS_OF(D.VER_US, D.SEQ, P.TS_US)"))
    assert(!out.toUpperCase.contains("FOR SYSTEM_TIME"))
    intercept[IllegalArgumentException] {
      TemporalSql.desugar("SELECT * FROM p JOIN unknown FOR SYSTEM_TIME AS OF p.ts AS u ON p.k = u.k")
    }
  }

  test("PROCTIME() form joins every probe to the dim's latest version only") {
    import spark.implicits._
    Seq(TjrDim(1L, 100L, 1L, 1.0), TjrDim(1L, 200L, 2L, 2.0),
        TjrDim(1L, 200L, 3L, 3.0), TjrDim(2L, 50L, 4L, 9.0))
      .toDS().createOrReplaceTempView("ptj_dims_spec")
    Seq(TjrProbe(10L, 1L, 1L), TjrProbe(11L, 2L, 999L))
      .toDS().createOrReplaceTempView("ptj_probes_spec")
    TemporalSql.registerVersioned("ptj_dims_spec", "ver_us", "seq", "k")
    val out = TemporalSql.sql(spark,
      """SELECT p.id, d.price FROM ptj_probes_spec p
         JOIN ptj_dims_spec FOR SYSTEM_TIME AS OF PROCTIME() AS d ON p.k = d.k
         ORDER BY p.id""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // probe 10's own time (1) is BEFORE every version — proc-time still
    // joins the latest (ver 200, seq 3); same-instant versions break by seq
    assert(out === Seq((10L, 3.0), (11L, 9.0)))
    // without a keyed registration the proc-time form fails loudly
    TemporalSql.registerVersioned("ptj_nokey_spec", "ver_us", "seq")
    val e = intercept[IllegalArgumentException] {
      TemporalSql.desugar(
        "SELECT * FROM p JOIN ptj_nokey_spec FOR SYSTEM_TIME AS OF PROCTIME() AS d ON p.k = d.k")
    }
    assert(e.getMessage.contains("PRIMARY KEY"))
  }

  test("marked streaming join plans into the state op and joins versions as-of") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dimS = MemoryStream[TjrDim]
    val probeS = MemoryStream[TjrProbe]
    // two versions for key 1 (at t=10 and t=30), one for key 2 (t=20)
    dimS.addData(TjrDim(1, 10, 1, 1.0), TjrDim(1, 30, 2, 3.0), TjrDim(2, 20, 1, 2.0))
    // probes at t=15 (sees v1), t=35 (sees v2), t=5 (before any → null),
    // key2 at t=25 (sees its v1); far-future sentinel flushes the rest
    probeS.addData(TjrProbe(1, 1, 15), TjrProbe(2, 1, 35), TjrProbe(3, 1, 5), TjrProbe(4, 2, 25),
      TjrProbe(-1, -1, 7258118400000000L))
    val dv = "dims_spec_v"
    val pv = "probes_spec_v"
    dimS.toDS().toDF().createOrReplaceTempView(dv)
    probeS.toDS().toDF().createOrReplaceTempView(pv)
    TemporalSql.registerVersioned(dv, "ver_us", "seq")
    val df = TemporalSql.sql(spark, s"""
      SELECT p.id, p.k, d.price
      FROM $pv p
      LEFT JOIN $dv FOR SYSTEM_TIME AS OF p.ts_us AS d ON p.k = d.k""")
    // the Join node must be gone (a stream-stream join with this
    // condition is otherwise unexecutable)
    assert(df.queryExecution.analyzed.collectFirst { case j: Join => j }.isEmpty,
      "temporal-join rewrite did not fire")
    val q = df.writeStream.format("memory").queryName("tj_rule_spec")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tj_rule_spec")
        .filter($"id" > 0).orderBy($"id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toList
      assert(rows.length == 4, s"got $rows")
      assert(rows(0) == ((1L, 1L, 1.0)), s"probe@15 must see v1: $rows")
      assert(rows(1) == ((2L, 1L, 3.0)), s"probe@35 must see v2: $rows")
      assert(rows(2)._3.isNaN, s"probe@5 precedes all versions: $rows")
      assert(rows(3) == ((4L, 2L, 2.0)), s"key2 probe@25 must see its v1: $rows")
    } finally q.stop()
  }

  test("held probe joins a dim version that arrives in a LATER batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dimS = MemoryStream[TjrDim]
    val probeS = MemoryStream[TjrProbe]
    val dv = "dims_late_v"
    val pv = "probes_late_v"
    dimS.toDS().toDF().createOrReplaceTempView(dv)
    probeS.toDS().toDF().createOrReplaceTempView(pv)
    TemporalSql.registerVersioned(dv, "ver_us", "seq")
    val df = TemporalSql.sql(spark, s"""
      SELECT p.id, d.price FROM $pv p
      LEFT JOIN $dv FOR SYSTEM_TIME AS OF p.ts_us AS d ON p.k = d.k""")
    val q = df.writeStream.format("memory").queryName("tj_late_spec")
      .outputMode("append").start()
    try {
      // batch 1: one version and the probe — watermark (1h delay) has
      // not passed t=50, so the probe is HELD, not joined to v1 yet
      dimS.addData(TjrDim(1, 10, 1, 1.0))
      probeS.addData(TjrProbe(1, 1, 50))
      q.processAllAvailable()
      assert(spark.table("tj_late_spec").filter($"id" === 1).isEmpty,
        "probe released before the watermark passed it")
      // batch 2: a LATER version still at-or-before the probe's time,
      // plus the far-future sentinel that flushes the release — the
      // probe must see v2 (t=40), not the v1 it was buffered alongside
      dimS.addData(TjrDim(1, 40, 2, 2.0))
      probeS.addData(TjrProbe(-1, -1, 7258118400000000L))
      q.processAllAvailable()
      val rows = spark.table("tj_late_spec").filter($"id" === 1)
        .select($"price").as[Double].collect().toList
      assert(rows == List(2.0), s"expected the late v2, got $rows")
    } finally q.stop()
  }

  test("batch inputs plan into the as-of window formulation") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // key 1: versions at t=10 (seq 1, price 1.0), t=10 (seq 2, 1.5 —
    // same-instant ties resolve to the higher seq), t=30 (seq 3, 3.0)
    Seq((1L, 10L, 1L, 1.0), (1L, 10L, 2L, 1.5), (1L, 30L, 3L, 3.0))
      .toDF("k", "ver_us", "seq", "price").createOrReplaceTempView("b_asof_dim")
    Seq((1L, 1L, 15L), (2L, 1L, 35L), (3L, 1L, 5L), (4L, 9L, 50L))
      .toDF("id", "k", "ts_us").createOrReplaceTempView("b_asof_probe")
    TemporalSql.registerVersioned("b_asof_dim", "ver_us", "seq")
    val df = TemporalSql.sql(spark, """
      SELECT p.id, d.price FROM b_asof_probe p
      LEFT JOIN b_asof_dim FOR SYSTEM_TIME AS OF p.ts_us AS d ON p.k = d.k""")
    assert(df.queryExecution.analyzed.collectFirst { case j: Join => j }.isEmpty,
      "batch as-of rewrite did not fire")
    val rows = df.orderBy($"id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toList
    assert(rows == List(
      (1L, Some(1.5)),  // at t=15: same-instant tie at t=10 → seq 2
      (2L, Some(3.0)),  // at t=35: v3
      (3L, None),       // before any version
      (4L, None)))      // key with no versions at all
    // INNER drops the unmatched probes
    val inner = TemporalSql.sql(spark, """
      SELECT p.id, d.price FROM b_asof_probe p
      JOIN b_asof_dim FOR SYSTEM_TIME AS OF p.ts_us AS d ON p.k = d.k""")
    assert(inner.select("id").as[Long].collect().sorted.toList == List(1L, 2L))
  }

  test("mixed-boundedness or out-of-shape joins are left untouched") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // extra non-equi conjunct → out of shape, rule must not fire
    Seq((1L, 2L)).toDF("k", "ts").createOrReplaceTempView("oos_probe")
    Seq((1L, 1L, 1L)).toDF("k", "ver", "seq").createOrReplaceTempView("oos_dim")
    val analyzed = spark.sql(
      """SELECT * FROM oos_probe p JOIN oos_dim d
         ON p.k = d.k AND p.k > 0 AND SYSTEM_TIME_AS_OF(d.ver, d.seq, p.ts)""")
      .queryExecution.analyzed
    val after = StreamTemporalJoinRule(spark)(analyzed)
    assert(after.collectFirst { case j: Join => j }.isDefined,
      "rule must not fire on an out-of-shape condition")
  }
}
