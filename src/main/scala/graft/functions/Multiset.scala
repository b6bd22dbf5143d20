package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * MULTISET support — the reference's `COLLECT` aggregate returns a
 * MULTISET, represented internally as a count-map element → int, with
 * `CARDINALITY` (total element count, multiplicity included) and
 * `ELEMENT` (the sole element of a singleton multiset) over it
 * (`flink-table/flink-table-common/src/main/java/org/apache/flink/table/functions/BuiltInFunctionDefinitions.java:290-386`;
 * runtime count-map in `flink-table-runtime` MapDataUtil /
 * CollectAggFunction). Re-expressed Spark-first as a `map<elem, int>`
 * column convention built from vectorized collection expressions — no
 * UDFs, stays inside codegen.
 *
 * Scale: `collect` folds the group's values driver-free but holds one
 * `collect_list` per group during aggregation — fine for the bounded
 * per-key groups it is meant for (same envelope as the reference's
 * CollectAggFunction, which also materializes the map per group). For
 * very large groups the canonical plan is the two-level rewrite
 * (GROUP BY key, elem → count, then map_from_entries over the counted
 * pairs), which shuffles only (key, elem) partial counts; `collect`
 * keeps the one-shot aggregate form for SQL-surface parity.
 */
object Multiset {

  /** COLLECT(col) → multiset as a key-sorted `map<elem, int>`. */
  def collect(c: Column): Column = {
    val lst = collect_list(c)
    map_from_entries(array_sort(transform(array_distinct(lst),
      e => struct(e.as("k"), size(filter(lst, _ === e)).as("v")))))
  }

  /** CARDINALITY(multiset): total count including multiplicity. */
  def cardinality(ms: Column): Column =
    coalesce(aggregate(map_values(ms), lit(0L), (acc, v) => acc + v), lit(0L))

  /** ELEMENT(multiset): the sole element when the multiset has exactly
   * one member, NULL otherwise (the reference raises on >1; NULL keeps
   * the expression total — documented divergence). */
  def element(ms: Column): Column =
    when(cardinality(ms) === 1L, element_at(map_keys(ms), 1))
}
