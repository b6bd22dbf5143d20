package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Skew-split COUNT(DISTINCT) (the reference's SplitAggregateRule,
 * `flink-table-planner/.../rules/logical/SplitAggregateRule` — SURVEY
 * §4.1 "Distinct-agg split (skew)"): a single hot group otherwise
 * funnels every distinct value through one reducer. Bucketing the
 * DISTINCT column by hash partitions its value space, so
 *
 *   count(distinct x) = Σ_b count(distinct x | hash(x) % N = b)
 *
 * level 1 groups by (keys, bucket) — the hot group fans out over N
 * reducers — and level 2 sums the per-bucket partial distinct counts.
 * Identical results to the plain aggregate by construction, which the
 * gate proves against the unsplit SQL oracle.
 *
 * The optimizer-rule form of the same rewrite (for SQL users) is
 * `graft.rules.SplitDistinctAggRule`.
 */
object SkewAgg {

  def countDistinctSplit(df: DataFrame, groupCols: Seq[String],
      distinctCol: String, buckets: Int, outName: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val g: Seq[Column] = groupCols.map(col)
    df.groupBy(g :+ pmod(xxhash64(col(distinctCol)), lit(buckets)).as("__bucket"): _*)
      .agg(count_distinct(col(distinctCol)).as("__pc"))
      .groupBy(g: _*)
      // coalesce: a global (no-group) count over empty input stays 0
      .agg(coalesce(sum(col("__pc")), lit(0L)).cast("bigint").as(outName))
  }
}
