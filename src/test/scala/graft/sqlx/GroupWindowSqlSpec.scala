package graft.sqlx

import org.scalatest.funsuite.AnyFunSuite

/** Legacy group-window SQL rewriting: TUMBLE/HOP/SESSION in GROUP BY
 * with the START/END auxiliary functions (the reference's pre-TVF
 * syntax). */
class GroupWindowSqlSpec extends AnyFunSuite {

  test("TUMBLE rewrites to window() with *_START/*_END as struct fields") {
    val q = GroupWindowSql.desugar("""
      SELECT TUMBLE_START(ts, INTERVAL '15' MINUTE) AS ws, count(*) AS n
      FROM events GROUP BY TUMBLE(ts, INTERVAL '15' MINUTE)""")
    assert(q.contains("window(ts, '900 seconds')"))
    assert(q.contains("window.start AS ws"))
    assert(!q.toUpperCase.contains("TUMBLE"))
  }

  test("HOP swaps the reference (slide, size) order into window(col, size, slide)") {
    val q = GroupWindowSql.desugar("""
      SELECT HOP_END(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE) AS we
      FROM events GROUP BY HOP(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE)""")
    assert(q.contains("window(ts, '1800 seconds', '600 seconds')"))
    assert(q.contains("window.end AS we"))
  }

  test("SESSION rewrites to session_window() and its struct") {
    val q = GroupWindowSql.desugar("""
      SELECT user_id, SESSION_START(ts, INTERVAL '30' MINUTE) AS ws
      FROM events GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)""")
    assert(q.contains("session_window(ts, '1800 seconds')"))
    assert(q.contains("session_window.start AS ws"))
  }

  test("mismatched auxiliary arguments raise instead of mis-bucketing") {
    intercept[IllegalArgumentException] {
      GroupWindowSql.desugar("""
        SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE) AS ws
        FROM events GROUP BY TUMBLE(ts, INTERVAL '15' MINUTE)""")
    }
  }

  test("two distinct group windows, or an auxiliary without one, raise") {
    intercept[IllegalArgumentException] {
      GroupWindowSql.desugar(
        "SELECT 1 FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE), SESSION(ts, INTERVAL '5' MINUTE)")
    }
    intercept[IllegalArgumentException] {
      GroupWindowSql.desugar("SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) FROM e")
    }
  }

  test("TVF-form calls and unrelated identifiers pass through untouched") {
    val tvf = "SELECT * FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTE))"
    assert(GroupWindowSql.desugar(tvf) == tvf)
    val plain = "SELECT my_session_start, tumbler FROM t"
    assert(GroupWindowSql.desugar(plain) == plain)
  }
}
