package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{queries => qp}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
 *
 * `queries` is the operator inventory (one entry per implemented
 * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
 * SQL for the driver's hash-match correctness gate.
 */
object SparkEntry {

  /** All operator packs. Order matters only for map merge (later packs
   * may not shadow earlier names — names are prefixed per family). */
  private val packs: Seq[QueryPack] = Seq(
    qp.AggregateQueries,
    qp.TpchQueries,
    qp.TpcdsShapeQueries,
    qp.TpcdsShapeQueries2,
    qp.SubqueryQueries,
    qp.JoinQueries,
    qp.SetOpQueries,
    qp.WindowOverQueries,
    qp.CalcQueries,
    qp.GapFnQueries,
    qp.UdfQueries,
    qp.TimeWindowQueries,
    qp.StreamQueries,
    qp.CepQueries,
    qp.GenericStreamQueries,
    qp.TextQueries,
    qp.DedupQueries,
    qp.MultimodalQueries,
    qp.FormatQueries,
    qp.ChangelogQueries,
    qp.GraphQueries,
    qp.DdlQueries,
    qp.DataSetQueries,
    qp.SimilarityQueries,
    qp.BucketQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   * TPC-H Q3 shape: 3-way join → filter → agg → top-k. The selective
   * customer filter joins (broadcast) into orders FIRST, pruning ~4/5 of
   * orders before the expensive lineitem shuffle — at 100× scale this is
   * the difference between shuffling all lineitems and the surviving
   * fifth. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val prunedOrders = ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    li.join(prunedOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
