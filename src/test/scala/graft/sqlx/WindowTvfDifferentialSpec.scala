package graft.sqlx

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential fuzzer for the window-TVF SQL front-end: random sizes,
 * slides, steps, and offsets, in BOTH argument forms (positional and
 * named with shuffled argument order), must produce exactly the rows
 * of the DataFrame twin (`window()` / CumulateWindow). Guards the
 * regex/lexer desugaring the same way the MATCH_RECOGNIZE and
 * streaming-OVER fuzzers guard theirs — the grammar corners (argument
 * order, optional OFFSET, interval spellings) are the fuzzed axes. */
class WindowTvfDifferentialSpec extends SparkSuite {

  private def agg(df: DataFrame, ws: String, we: String): DataFrame =
    df.groupBy(col(ws).as("ws"), col(we).as("we"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100)).as("cents"))

  private def rows(df: DataFrame): Set[(String, String, Long, Long)] =
    df.collect().map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1)),
      r.getLong(2), r.getLong(3))).toSet

  test("window TVF SQL equals the DataFrame twin on random intervals and arg forms") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events")
    ev.createOrReplaceTempView("events")
    val rnd = new scala.util.Random(20260819L)
    val sizesMin = Vector(5, 10, 15, 20, 30, 60)
    for (case_ <- 0 until 12) {
      val fn = Vector("TUMBLE", "HOP", "CUMULATE")(rnd.nextInt(3))
      // a duration of n minutes in a random spelling: literal forms
      // plus the constant-EXPRESSION forms the reference grammar
      // accepts (arithmetic, make_interval) — each must evaluate
      // through the session to the same seconds
      def iv(n: Int) = rnd.nextInt(5) match {
        case 0 => s"INTERVAL '$n' MINUTE"
        case 1 => s"INTERVAL '${n * 60}' SECOND"
        case 2 if n > 1 => s"INTERVAL '${n - 1}' MINUTE + INTERVAL '60' SECOND"
        case 3 => s"make_interval(0, 0, 0, 0, 0, $n, 0)"
        case _ => s"INTERVAL '$n' MINUTE"
      }
      // (durArgs in positional order, twin)
      val (durs, twin) = fn match {
        case "TUMBLE" =>
          val size = sizesMin(rnd.nextInt(sizesMin.size))
          val off = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(size - 1)) else None
          val w = off match {
            case Some(o) => window(col("ts"), s"$size minutes", s"$size minutes", s"$o minutes")
            case None => window(col("ts"), s"$size minutes")
          }
          (Seq("SIZE" -> size) ++ off.map("OFFSET" -> _),
            agg(ev.withColumn("__w", w), "__w.start", "__w.end"))
        case "HOP" =>
          val slide = Vector(5, 10, 15)(rnd.nextInt(3))
          val size = slide * (2 + rnd.nextInt(3))
          val off = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(slide - 1)) else None
          val w = off match {
            case Some(o) => window(col("ts"), s"$size minutes", s"$slide minutes", s"$o minutes")
            case None => window(col("ts"), s"$size minutes", s"$slide minutes")
          }
          (Seq("SLIDE" -> slide, "SIZE" -> size) ++ off.map("OFFSET" -> _),
            agg(ev.withColumn("__w", w), "__w.start", "__w.end"))
        case _ =>
          val step = Vector(5, 10, 15)(rnd.nextInt(3))
          val size = step * (2 + rnd.nextInt(3))
          (Seq("STEP" -> step, "SIZE" -> size),
            agg(graft.operators.CumulateWindow(ev, "ts", step, size),
              "w_start", "w_end"))
      }
      val sqlArgs =
        if (rnd.nextBoolean())
          (s"TABLE events" +: s"DESCRIPTOR(ts)" +: durs.map(d => iv(d._2))).mkString(", ")
        else rnd.shuffle(
          Seq("DATA => TABLE events", "TIMECOL => DESCRIPTOR(ts)") ++
            durs.map { case (k, v) => s"$k => ${iv(v)}" }).mkString(", ")
      val text = s"""
        SELECT window_start AS ws, window_end AS we,
               count(*) AS n, sum(floor(value * 100)) AS cents
        FROM TABLE($fn($sqlArgs))
        GROUP BY window_start, window_end"""
      val got = rows(WindowTvfSql.sql(spark, text))
      val exp = rows(twin)
      assert(got == exp,
        s"case $case_ [$fn($sqlArgs)]: TVF SQL diverged from DataFrame twin\n" +
        s" only-sql ${(got -- exp).toList.sorted.take(5)}\n" +
        s" only-df  ${(exp -- got).toList.sorted.take(5)}")
    }
  }
}
