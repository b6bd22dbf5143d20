package graft.queries

import graft.QueryPack
import graft.streaming.{BoundedOver, StatefulOps, StreamOps, TemporalJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order row for the generic stateful gates (`ts_us` = o_orderdate in
 * epoch micros — the event-time convention of the streaming layer). */
case class ORow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_orderpriority: String, o_totalprice: Double, ts_us: Long)

/** Versioned-dimension row for the generic temporal join: each order is
 * a new version of its customer's state. */
case class OrderVer(o_custkey: Long, ts_us: Long, o_orderkey: Long, o_totalprice: Double)

/** Probe row for the generic temporal join. */
case class OProbe(o_orderkey: Long, o_custkey: Long, ts_us: Long)

/**
 * Non-`Ev` oracle gates for the schema-generic stateful layer
 * (SURVEY.md §2.5/§2.3/§2.9): the reference runtime operators are
 * RowData-generic (`ProcTimeDeduplicateKeepLastRowFunction`,
 * `AppendOnlyTopNFunction`, `RowTime*BoundedPrecedingFunction`,
 * `TemporalRowTimeJoinOperator`); these gates run the graft analogs
 * over the `orders` schema — partition keys, event times, and ids all
 * picked out by field name — proving none of them is bound to the
 * events fixture.
 */
object GenericStreamQueries extends QueryPack {

  private def ordersTyped(s: SparkSession, dir: String) = {
    import s.implicits._
    StreamOps.readStream(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
      .as[ORow]
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Generic keep-LAST dedup: latest order per customer by
    // (o_orderdate, o_orderkey); the update stream re-ranked to its
    // final upsert image, as an upsert sink would.
    "stream_dedup_keeplast_generic" -> ((s0, dir) => {
      val s = StreamOps.tuned(s0)
      val updates = StreamOps.runToBatch(
        s, StatefulOps.keepLastBy(ordersTyped(s, dir), "o_custkey", "ts_us", "o_orderkey").toDF(),
        "update", "keeplast_gen")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("ts_us").desc, col("o_orderkey").desc)
      updates.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"))
        .orderBy(col("o_custkey"))
    }),

    // Generic streaming Top-N: top-3 orders per priority class by
    // (o_totalprice desc, o_orderkey); distinct emitted candidates
    // re-ranked, as the Ev gate does.
    "stream_topn_generic" -> ((s0, dir) => {
      val s = StreamOps.tuned(s0)
      val updates = StreamOps.runToBatch(
        s, StatefulOps.topNBy(ordersTyped(s, dir), "o_orderpriority", "o_totalprice", "o_orderkey", 3).toDF(),
        "update", "topn_gen")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      updates.distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // Generic row-time temporal join: each order probes the customer's
    // order-version state AS OF just before its own date — i.e. is
    // enriched with the customer's previous order (left semantics:
    // first orders get NULLs). Probes are staged with a far-future
    // sentinel so the final watermark releases every held probe.
    "stream_temporal_join_generic" -> ((s0, dir) => {
      val s = StreamOps.tuned(s0)
      import s.implicits._
      val dims = StreamOps.readStream(s, dir, "orders")
        .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
          col("o_orderkey"), col("o_totalprice"))
        .as[OrderVer]
      val probes = StreamOps.tableWithFinalWatermark(
          s, dir, "orders", "o_orderdate", Seq("o_orderkey", "o_custkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          (unix_micros(col("o_orderdate").cast("timestamp")) - 1).as("ts_us"))
        .as[OProbe]
      val joined = TemporalJoin.runTyped(dims, probes,
        "o_custkey", "ts_us", "o_orderkey", "o_custkey", "ts_us", "o_orderkey")
      StreamOps.runToBatch(s, joined.toDF(), "append", "tjoin_gen")
        .filter(col("probe.o_orderkey") >= 0)
        .select(col("probe.o_orderkey").as("o_orderkey"),
          col("probe.o_custkey").as("o_custkey"),
          col("dim.o_orderkey").as("prev_orderkey"),
          col("dim.o_totalprice").as("prev_price"))
        .orderBy(col("o_orderkey"))
    }),

    // Generic event-time bounded OVER (ROWS 2 PRECEDING): per-customer
    // sliding 3-order count + integer-cent sum, released on watermark
    // passage; the staged sentinel drives the final flush.
    "stream_over_bounded_generic" -> ((s0, dir) => {
      val s = StreamOps.tuned(s0)
      import s.implicits._
      val rows = StreamOps.tableWithFinalWatermark(
          s, dir, "orders", "o_orderdate", Seq("o_orderkey", "o_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
        .as[ORow]
      val out = BoundedOver.runBy(rows, "o_custkey", "ts_us", "o_orderkey",
        "o_totalprice", BoundedOver.RowsFrame(2))
      StreamOps.runToBatch(s, out.toDF(), "append", "obrows_gen")
        .filter(col("row.o_orderkey") >= 0)
        .select(col("row.o_custkey").as("o_custkey"),
          col("row.o_orderkey").as("o_orderkey"),
          col("frame_n"), col("frame_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "stream_dedup_keeplast_generic" -> """
      SELECT o_custkey, o_orderkey AS last_orderkey FROM (
        SELECT o_custkey, o_orderkey, row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders)
      WHERE rn = 1 ORDER BY o_custkey""",
    "stream_topn_generic" -> """
      SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice, row_number() OVER (
          PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_orderpriority, rn""",
    "stream_temporal_join_generic" -> """
      SELECT f.o_orderkey, f.o_custkey, p.o_orderkey AS prev_orderkey,
             p.o_totalprice AS prev_price
      FROM orders f LEFT JOIN LATERAL (
        SELECT e.* FROM orders e WHERE e.o_custkey = f.o_custkey
          AND e.o_orderdate < f.o_orderdate
        ORDER BY e.o_orderdate DESC, e.o_orderkey DESC LIMIT 1) p ON true
      ORDER BY f.o_orderkey""",
    "stream_over_bounded_generic" -> """
      SELECT o_custkey, o_orderkey, count(*) OVER w AS frame_n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS frame_cents
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""
  )
}
