package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Pre-partitioned (bucketed) storage: the shuffle-elimination contract
 * the reference exposes as `SplitDataProperties.splitsPartitionedBy /
 * splitsGroupedBy / splitsOrderedBy`
 * (flink-java/src/main/java/org/apache/flink/api/java/io/
 * SplitDataProperties.java:119,200) — a source declares its splits
 * pre-partitioned/grouped/sorted on a key and the optimizer drops the
 * partitioning/sort step before joins and grouping. Spark's native
 * form is bucketed tables: `bucketBy(n, key).sortBy(key).saveAsTable`
 * records HashPartitioning(key, n) + per-bucket order in the catalog,
 * and a join or groupBy on the bucket key then plans with ZERO
 * ShuffleExchange on the bucketed side (PlanAuditSpec pins this).
 *
 * 100-TB story: bucketing is THE amortization lever for a fact table
 * that is joined on the same key by many downstream queries — the
 * shuffle is paid ONCE at ingest (here: 8 buckets; at 100 TB you'd use
 * O(10k) buckets sized to executor memory) and every subsequent
 * co-located join/agg reads both sides aligned. Writing with
 * `repartition(n, key)` before `bucketBy(n, key)` yields exactly one
 * file per bucket (Spark's bucket id and repartition both use
 * pmod(murmur3, n)), which is also what lets the per-bucket sortBy
 * metadata satisfy SortMergeJoin's ordering requirement without a
 * Sort node.
 *
 * Results are bucketing-invariant, so every gate has a plain-SQL
 * oracle over the unbucketed parquet.
 */
object BucketQueries extends QueryPack {

  /** Write `df` as an EXTERNAL bucketed+sorted table (one file per
   * bucket) at a fresh temp path, idempotently: overwrite handles
   * re-runs within one session (Bench), and the fresh path sidesteps a
   * managed-table location left behind by a PREVIOUS JVM (the in-memory
   * catalog forgets the table but `spark-warehouse/<name>` survives and
   * CREATE then fails with LOCATION_ALREADY_EXISTS). Returns the table
   * handle. */
  private def bucketed(s: SparkSession, df: DataFrame, name: String,
      buckets: Int, key: String): DataFrame = {
    // DisableUnnecessaryBucketedScan only credits interesting
    // partitioning (join/agg), not bucket PRUNING — with it on, the
    // planner reverts the pruned-lookup scan to a plain file scan. The
    // flag only affects bucketed-table scans, all of which these gates
    // want bucketed.
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val path = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    df.repartition(buckets, col(key))
      .write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
    s.table(name)
  }

  /** The SHARED bucketed lineitem ingest (r15): all three gates read
   * lineitem bucketed on l_orderkey, and bucketing's whole point is
   * that the ingest shuffle+write is paid ONCE and amortized across
   * every downstream query — so the gates now share one bucketed table
   * carrying the union of their columns (written once per session)
   * instead of each writing its own projection. Derived columns
   * (net_cents etc.) project AFTER the bucketed scan, which preserves
   * the scan's HashPartitioning and per-bucket order, so the pinned
   * plan properties (no Exchange on the bucketed side, bucket pruning)
   * are unchanged — PlanAuditSpec still passes. */
  private val sharedWritten = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private def bucketedLineitem(s: SparkSession, dir: String): DataFrame = {
    val name = "bkt_lineitem_shared"
    sharedWritten.synchronized {
      sharedWritten.getOrElseUpdate(s"${graft.FrameCache.idOf(s)}#$dir", {
        bucketed(s, Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount")),
          name, 8, "l_orderkey")
        ()
      })
    }
    // autoBucketedScan stays disabled for these gates even when the
    // write was done by an earlier query of the session
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    s.table(name)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Co-located fact-fact join: both sides bucketed on the join key →
    // SortMergeJoin with no shuffle on either side (the SplitDataProperties
    // splitsPartitionedBy contract). The only Exchange in the whole plan
    // is the final low-cardinality rollup.
    "bucket_colocated_join" -> ((s, dir) => {
      val o = bucketed(s, Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        "bkt_orders", 8, "o_orderkey")
      val l = bucketedLineitem(s, dir)
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("net_cents"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("net_cents")).as("cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // Grouping on the bucket key: the per-key aggregate runs with no
    // Exchange at all (splitsGroupedBy analog) — partial and final
    // HashAggregate collapse onto the scan's partitioning. The second
    // histogram agg keeps the gate's output bounded.
    "bucket_local_agg" -> ((s, dir) => {
      val l = bucketedLineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"))
      l.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_quantity") * 100)).as("qty_cents"))
        .groupBy(col("n_items"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("qty_cents")).as("qty_cents"))
        .orderBy(col("n_items"))
    }),

    // Bucket pruning: an equality predicate on the bucket key reads 1
    // of 8 buckets (SelectedBucketsCount pinned in PlanAuditSpec) — the
    // storage-level analog of partition pruning for high-cardinality
    // keys, where directory-per-value partitioning would melt the
    // metastore.
    "bucket_pruned_lookup" -> ((s, dir) => {
      val l = bucketedLineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity") * 100).cast("long").as("qty_cents"))
      l.filter(col("l_orderkey") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("qty_cents"))
        .orderBy(col("l_linenumber"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "bucket_colocated_join" -> """
      SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "bucket_local_agg" -> """
      SELECT n_items, count(*) AS n_orders,
             CAST(sum(qty_cents) AS BIGINT) AS qty_cents
      FROM (SELECT l_orderkey, count(*) AS n_items,
                   CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS qty_cents
            FROM lineitem GROUP BY l_orderkey) t
      GROUP BY n_items ORDER BY n_items""",
    "bucket_pruned_lookup" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity * 100) AS BIGINT) AS qty_cents
      FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber"""
  )
}
