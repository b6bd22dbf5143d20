package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Randomized differential for the slice-shared hop: random
 * (size, slide | size) pairs and random keyed timestamps — the sliced
 * two-stage plan must equal Spark's native explode-based
 * `window(ts, size, slide)` aggregation exactly, window for window,
 * including windows fed by a single slice and slices straddling
 * window starts. */
class SliceHopDifferentialSpec extends SparkSuite {

  test("property: hopSliced equals the native hopping window aggregation") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (case_ <- 0 until 6) {
      val slideMin = 1 + rnd.nextInt(10)
      val fanout = 1 + rnd.nextInt(5)
      val sizeMin = slideMin * fanout
      val rows = (1 to 40 + rnd.nextInt(60)).map { i =>
        (i.toLong, 1 + rnd.nextInt(3), rnd.nextInt(300 * 60).toLong * 1000000L,
          rnd.nextInt(1000).toLong)
      }
      val df = rows.toDF("id", "k", "ts_us", "cents")
        .withColumn("ts", expr("cast(timestamp_micros(ts_us) as timestamp_ntz)"))

      val native = df
        .groupBy(col("k"), window(col("ts"), s"$sizeMin minutes", s"$slideMin minutes").as("w"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .select(col("k"), col("w.start").as("ws"), col("n"), col("s"))
        .as[(Int, java.time.LocalDateTime, Long, Long)].collect().toSet

      val sliced = SliceHop.hopSliced(df, "ts",
          sizeUs = sizeMin * 60L * 1000000L, slideUs = slideMin * 60L * 1000000L,
          keys = Seq(col("k")),
          partials = Seq(count(lit(1)).as("__pn"), sum(col("cents")).as("__ps")),
          merges = Seq(sum(col("__pn")).cast("bigint").as("n"),
            sum(col("__ps")).cast("bigint").as("s")))
        .select(col("k"), expr("cast(ws as timestamp_ntz)").as("ws"), col("n"), col("s"))
        .as[(Int, java.time.LocalDateTime, Long, Long)].collect().toSet

      assert(sliced == native,
        s"case $case_ (size=$sizeMin slide=$slideMin): " +
          s"sliced-only=${sliced -- native}, native-only=${native -- sliced}")
    }
  }
}
