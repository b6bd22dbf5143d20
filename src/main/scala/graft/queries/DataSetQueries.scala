package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * DataSet-API analogs and remaining row/partitioning surface
 * (SURVEY §2.2/§2.6/§2.7): typed map/filter/flatMap/mapPartitions
 * pipeline (reference `DataSet.java:213-289` / `DataStream.java:573+`),
 * side-output filter-split (reference `OutputTag.java:47` — SURVEY's
 * documented union-typed-column pattern), explicit Exchange surface
 * (hash repartition / range repartition + partition-local sort,
 * reference `BatchExecExchange`, `DataSet.partitionByHash:1289`,
 * `sortPartition:1480`).
 */
object DataSetQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed pipeline: map → filter → flatMap → mapPartitions, then agg.
    // zipWithIndex (reference DataSetUtils.zipWithIndex — two-phase
    // count-then-offset; Spark RDD.zipWithIndex is the same algorithm):
    // contiguous 0..n-1 ids over a total order.
    "dset_zip_with_index" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.operators.DataSetUtils.zipWithIndexOrdered(
          Tables.load(s, dir, "events").select("event_id", "event_type"),
          col("event_id"))
        .orderBy(col("idx"))
    }),

    "dset_typed_pipeline" -> ((s, dir) => {
      import s.implicits._
      graft.api.StreamEnv.get(s)
        .fromDataset(Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .as[(Long, String, Double)])
        .map { case (k, st, p) => (k, st, math.floor(p * 100).toLong) }    // map
        .filter(_._3 > 1000000L)                                           // filter
        .flatMap { case (k, st, c) =>                                      // flatMap: 2 rows out
          Iterator((k, st, c, "full"), (k, st, c / 2, "half"))
        }
        .mapPartitions(it => it.map { case (k, st, c, tag) => (st, tag, c) }) // mapPartitions
        .toDF()
        .toDF("status", "tag", "cents")
        .groupBy(col("status"), col("tag"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("status"), col("tag"))
    }),

    // Keyed reduce (reference KeyedStream.reduce / DataSet.reduceGroup):
    // associative+commutative typed fold per key — the winner is the
    // max by (integer cents, id), deterministic under any combine order.
    "dset_keyed_reduce" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          if (a._3 > b._3 || (a._3 == b._3 && a._2 > b._2)) a else b
        }
        .map(_._2)
        .toDF("o_custkey", "o_orderkey", "cents")
        .orderBy(col("o_custkey"))
    }),

    // Side outputs: one pass tags rows (main/late/oversize), branches
    // split by filter, processed separately, unioned back with the tag.
    "side_outputs_split" -> ((s, dir) => {
      val tagged = Tables.load(s, dir, "events")
        .withColumn("tag",
          when(col("value") < 0, "negative")
            .when(col("value") > 90, "oversize")
            .otherwise("main"))
      val main = tagged.filter(col("tag") === "main")
        .groupBy(col("tag"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100)).as("cents"))
      val side = tagged.filter(col("tag") =!= "main")
        .groupBy(col("tag"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100)).as("cents"))
      main.unionByName(side)
        .orderBy(col("tag"), col("event_type"))
    }),

    // Exchange surface: explicit hash partitioning before the agg and a
    // range partition + partition-local sort (sortPartition analog) —
    // the partition-invariant aggregate proves correctness.
    "exchange_partitioning" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .repartition(16, col("o_custkey"))                 // partitionByHash
        .repartitionByRange(8, col("o_orderkey"))          // partitionByRange
        .sortWithinPartitions(col("o_orderkey"))           // sortPartition
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "dset_zip_with_index" -> """
      SELECT row_number() OVER (ORDER BY event_id) - 1 AS idx,
             event_id, event_type
      FROM events ORDER BY idx""",
    "dset_typed_pipeline" -> """
      WITH m AS (SELECT o_orderstatus AS status,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders
                 WHERE CAST(floor(o_totalprice * 100) AS BIGINT) > 1000000)
      SELECT status, tag, count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_cents
      FROM (SELECT status, 'full' AS tag, cents AS c FROM m
            UNION ALL
            SELECT status, 'half', cents // 2 FROM m)
      GROUP BY status, tag ORDER BY status, tag""",
    "dset_keyed_reduce" -> """
      SELECT o_custkey, o_orderkey, cents
      FROM (SELECT o_custkey, o_orderkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
                              o_orderkey DESC) AS rn
            FROM orders) t
      WHERE rn = 1 ORDER BY o_custkey""",
    "side_outputs_split" -> """
      SELECT CASE WHEN value < 0 THEN 'negative'
                  WHEN value > 90 THEN 'oversize'
                  ELSE 'main' END AS tag,
             event_type, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY tag, event_type ORDER BY tag, event_type""",
    "exchange_partitioning" -> """
      SELECT o_orderstatus, count(*) AS n,
             min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
