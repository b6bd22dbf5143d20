package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * A named group of operator queries plus their DuckDB oracle SQL.
 *
 * Contract (driver-enforced, see BASELINE.md):
 *  - every `queries` key that is SQL-expressible has an `oracle` entry;
 *  - result column names match the oracle column names exactly (the
 *    compare sorts columns by name before hashing);
 *  - results are value-deterministic across engines: exact sums go
 *    through DECIMAL, order-sensitive outputs carry a total ORDER BY
 *    with a unique tiebreaker, float-noise-prone aggregates are rounded.
 */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
