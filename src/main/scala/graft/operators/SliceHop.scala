package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Slice-shared hopping-window aggregation — the reference's slicing
 * optimization for HOP windows (`StreamExecWindowAggregate.java:74`
 * planning over `SliceAssigners.hopping`; slices shared across the
 * overlapping windows): Spark's native `window(ts, size, slide)`
 * EXPLODES every row into its size/slide containing windows before
 * aggregating, so a 1h/5min hop pays a 12× row blowup through the
 * shuffle. Slicing assigns each row ONCE to its slide-width slice,
 * pre-aggregates per slice (map-side combinable, full-width rows never
 * fan out), and then rolls each window's size/slide slices up — the
 * fanout moves from the DATA to the already-aggregated (tiny) slice
 * frame.
 *
 * Requires size % slide == 0 (the reference's hopping slice assigner
 * makes the same demand) and slice-decomposable aggregates: the caller
 * supplies each aggregate twice — `partials` over raw rows within a
 * slice, `merges` over the slice partials (COUNT→SUM, SUM→SUM,
 * MIN→MIN, MAX→MAX). Non-decomposable aggregates (COUNT DISTINCT)
 * need the unsliced form or a distinct-view state, as in the
 * reference.
 *
 * Scale: shuffle volume is one row per (keys, slice) — independent of
 * the overlap factor — versus one row per (input row × overlap) for
 * the explode plan.
 */
object SliceHop {

  /** Hopping windows of `sizeUs` every `slideUs` over `tsCol`, grouped
   * by `keys`. Output: keys ++ merge aliases ++ (ws, we) as
   * TIMESTAMP_NTZ, one row per window with ≥1 input row. */
  def hopSliced(df: DataFrame, tsCol: String, sizeUs: Long, slideUs: Long,
      keys: Seq[Column], partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(sizeUs > 0 && slideUs > 0 && sizeUs % slideUs == 0,
      "hopSliced requires size % slide == 0 (the hopping slice assigner's contract)")
    require(partials.nonEmpty && merges.nonEmpty, "need at least one aggregate")
    val fanout = (sizeUs / slideUs).toInt
    val sliced = df.withColumn("__slice_us",
      expr(s"(unix_micros(cast(`$tsCol` as timestamp)) div $slideUs) * $slideUs"))
    val perSlice = sliced.groupBy((keys :+ col("__slice_us")): _*)
      .agg(partials.head, partials.tail: _*)
    // every slice belongs to the `fanout` windows starting at
    // slice_start, slice_start - slide, …: the explode runs over the
    // aggregated slice frame, not the input
    val fanned = perSlice
      .withColumn("__k", explode(sequence(lit(0), lit(fanout - 1))))
      .withColumn("__ws_us", col("__slice_us") - col("__k").cast("long") * slideUs)
    fanned.groupBy((keys :+ col("__ws_us")): _*)
      .agg(merges.head, merges.tail: _*)
      .withColumn("ws", expr("cast(timestamp_micros(__ws_us) as timestamp_ntz)"))
      .withColumn("we", expr(s"cast(timestamp_micros(__ws_us + $sizeUs) as timestamp_ntz)"))
      .drop("__ws_us", "__slice_us", "__k")
  }
}
