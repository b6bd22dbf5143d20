package graft.sqlx

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit coverage for the window-TVF text rewriter: expansion shapes,
 * reference argument order, wrapper handling, quote-awareness, and the
 * loud-failure contract for unsupported forms. */
class WindowTvfSqlSpec extends SparkSuite {

  test("TUMBLE expands to a window() derived table with TVF columns") {
    val out = WindowTvfSql.desugar(
      "SELECT window_start FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE)) GROUP BY 1")
    assert(out.contains("window(ts, '900 seconds')"), out)
    assert(out.contains("window_start") && out.contains("window_end"), out)
    assert(!out.contains("TUMBLE") && !out.contains("DESCRIPTOR"), out)
  }

  test("TUMBLE optional offset becomes the window() offset argument") {
    val out = WindowTvfSql.desugar(
      "FROM TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '5' MINUTE)")
    assert(out.contains("window(ts, '900 seconds', '900 seconds', '300 seconds')"), out)
  }

  test("HOP argument order is (slide, size) per the reference") {
    val out = WindowTvfSql.desugar(
      "FROM HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '10' MINUTE, INTERVAL '30' MINUTE)")
    // Spark's window(col, size, slide): size 30min, slide 10min
    assert(out.contains("window(ts, '1800 seconds', '600 seconds')"), out)
  }

  test("CUMULATE expands to the slice-explode formulation") {
    val out = WindowTvfSql.desugar(
      "FROM CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '20' MINUTE, INTERVAL '1' HOUR)")
    assert(out.contains("explode(sequence(1, 3))"), out)
    assert(out.contains("__k * 1200"), out)
  }

  test("CUMULATE rejects a step that does not divide the size") {
    val e = intercept[IllegalArgumentException] {
      WindowTvfSql.desugar(
        "FROM CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '25' MINUTE, INTERVAL '1' HOUR)")
    }
    assert(e.getMessage.contains("divide"), e.getMessage)
  }

  test("TVF text inside a string literal is left untouched") {
    val q = "SELECT 'use TUMBLE(TABLE t, DESCRIPTOR(ts), x)' AS doc FROM t"
    assert(WindowTvfSql.desugar(q) == q)
  }

  test("sql() rejects an undesugared TVF form loudly") {
    // arguments in a non-grammar order (DESCRIPTOR before TABLE) is not
    // a form either syntax accepts — it must surface, not silently parse
    val e = intercept[IllegalArgumentException] {
      WindowTvfSql.sql(spark,
        "SELECT 1 FROM TABLE(TUMBLE(DESCRIPTOR(ts), TABLE ev, INTERVAL '15' MINUTE))")
    }
    assert(e.getMessage.contains("not desugared"), e.getMessage)
    // but a DESCRIPTOR( inside a string literal is NOT a leftover TVF
    assert(WindowTvfSql.sql(spark,
      "SELECT 'TUMBLE(TABLE t, DESCRIPTOR(ts), x)' AS doc").collect().length == 1)
  }

  test("junk in the argument tail or after the TVF raises, never silently drops") {
    // named interval argument would otherwise be discarded
    intercept[IllegalArgumentException] {
      WindowTvfSql.desugar(
        "FROM TUMBLE(TABLE ev, DESCRIPTOR(ts), SIZE => INTERVAL '15' MINUTE)")
    }
    // non-literal offset expression
    intercept[IllegalArgumentException] {
      WindowTvfSql.desugar(
        "FROM TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE, some_col)")
    }
    // text between the TVF close and the TABLE( close
    intercept[IllegalArgumentException] {
      WindowTvfSql.desugar(
        "FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE) garbage)")
    }
  }

  test("named-argument form desugars identically to the positional form") {
    val pos = WindowTvfSql.desugar(
      "FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE))")
    val named = WindowTvfSql.desugar(
      "FROM TABLE(TUMBLE(DATA => TABLE ev, TIMECOL => DESCRIPTOR(ts), " +
        "SIZE => INTERVAL '15' MINUTE))")
    assert(named == pos)
    // named args in ANY order (reference SqlWindowTableFunction named
    // parameters are order-free)
    val hopPos = WindowTvfSql.desugar(
      "FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '15' MINUTE))")
    val hopNamed = WindowTvfSql.desugar(
      "FROM TABLE(HOP(SIZE => INTERVAL '15' MINUTE, TIMECOL => DESCRIPTOR(ts), " +
        "DATA => TABLE ev, SLIDE => INTERVAL '5' MINUTE))")
    assert(hopNamed == hopPos)
    val cumPos = WindowTvfSql.desugar(
      "FROM TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '15' MINUTE))")
    val cumNamed = WindowTvfSql.desugar(
      "FROM TABLE(CUMULATE(DATA => TABLE ev, TIMECOL => DESCRIPTOR(ts), " +
        "STEP => INTERVAL '5' MINUTE, SIZE => INTERVAL '15' MINUTE))")
    assert(cumNamed == cumPos)
    // named TUMBLE with OFFSET
    val offPos = WindowTvfSql.desugar(
      "FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '5' MINUTE))")
    val offNamed = WindowTvfSql.desugar(
      "FROM TABLE(TUMBLE(OFFSET => INTERVAL '5' MINUTE, DATA => TABLE ev, " +
        "TIMECOL => DESCRIPTOR(ts), SIZE => INTERVAL '15' MINUTE))")
    assert(offNamed == offPos)
    // unknown named argument is loud
    intercept[IllegalArgumentException] {
      WindowTvfSql.desugar(
        "FROM TABLE(TUMBLE(DATA => TABLE ev, TIMECOL => DESCRIPTOR(ts), " +
          "SIZES => INTERVAL '15' MINUTE))")
    }
  }

  test("parenthesized durations and the HOP offset argument") {
    // HOP takes an optional third offset interval (positional + named)
    val hopOffPos = WindowTvfSql.desugar(
      "FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '5' MINUTE, " +
        "INTERVAL '15' MINUTE, INTERVAL '2' MINUTE))")
    assert(hopOffPos.contains("window(ts, '900 seconds', '300 seconds', '120 seconds')"),
      hopOffPos)
    val hopOffNamed = WindowTvfSql.desugar(
      "FROM TABLE(HOP(DATA => TABLE ev, TIMECOL => DESCRIPTOR(ts), " +
        "SLIDE => INTERVAL '5' MINUTE, SIZE => INTERVAL '15' MINUTE, " +
        "OFFSET => INTERVAL '2' MINUTE))")
    assert(hopOffNamed == hopOffPos)
    // a parenthesized duration expression (make_interval) survives the
    // lexer-matched argument span and evaluates via the sql() door
    val dir = "/root/testdata/sf0.001"
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    val viaMake = WindowTvfSql.sql(spark, """
      SELECT window_start AS ws, count(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts),
                        make_interval(0, 0, 0, 0, 1, 0, 0)))
      GROUP BY window_start ORDER BY ws""").collect()
    val viaLit = WindowTvfSql.sql(spark, """
      SELECT window_start AS ws, count(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
      GROUP BY window_start ORDER BY ws""").collect()
    assert(viaMake.toSeq == viaLit.toSeq)
  }

  test("constant interval expressions evaluate through the sql() door") {
    val dir = "/root/testdata/sf0.001"
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    val viaExpr = WindowTvfSql.sql(spark, """
      SELECT window_start AS ws, count(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts),
                        INTERVAL '30' MINUTE + INTERVAL '30' MINUTE))
      GROUP BY window_start ORDER BY ws""").collect()
    val viaLit = WindowTvfSql.sql(spark, """
      SELECT window_start AS ws, count(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
      GROUP BY window_start ORDER BY ws""").collect()
    assert(viaExpr.toSeq == viaLit.toSeq)
  }

  test("end-to-end: TVF SQL equals the DataFrame window() aggregation") {
    val dir = "/root/testdata/sf0.001"
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    val viaTvf = WindowTvfSql.sql(spark, """
      SELECT window_start AS ws, count(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
      GROUP BY window_start ORDER BY ws""").collect()
    val viaApi = graft.Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
      .orderBy(col("ws")).collect()
    assert(viaTvf.toSeq == viaApi.toSeq)
  }
}
