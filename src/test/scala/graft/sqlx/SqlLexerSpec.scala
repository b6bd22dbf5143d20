package graft.sqlx

import org.scalatest.funsuite.AnyFunSuite

/** The shared lexing primitives all sqlx front-ends sit on: literal
 * tracking, word-bounded keyword phrases, top-level splits, region
 * ends — with the keyword-inside-string-literal cases that regex
 * scanners historically got wrong. */
class SqlLexerSpec extends AnyFunSuite {

  test("quoted spans and inQuote") {
    val s = "a 'x y' b 'z' c"
    assert(SqlLexer.quotedSpans(s) == Vector((2, 6), (10, 12)))
    assert(SqlLexer.inQuote(s, 4))
    assert(!SqlLexer.inQuote(s, 8))
  }

  test("findKeyword skips literals and respects word boundaries") {
    // the first GROUP BY is inside a literal; 'subgroup by' must not hit
    val s = "SELECT 'GROUP BY' AS doc, subgroup FROM t GROUP   BY x"
    val hit = SqlLexer.findKeyword(s, "GROUP BY")
    assert(hit.isDefined && s.substring(hit.get._1, hit.get._2) == "GROUP   BY")
    // word boundary: `cleft` must not surface LEFT
    assert(SqlLexer.findKeyword("SELECT cleft FROM t", "LEFT").isEmpty)
    // multi-space phrases match across arbitrary whitespace
    assert(SqlLexer.findKeyword("ALL  ROWS\n PER\tMATCH", "ALL ROWS PER MATCH").contains((0, 20)))
  }

  test("splitTop honors parens AND string literals") {
    assert(SqlLexer.splitTop("a INT, b AS f(x, y), c STRING") ==
      Seq("a INT", "b AS f(x, y)", "c STRING"))
    // a comma inside a literal must not split — the historical regex bug
    assert(SqlLexer.splitTop("a INT, b AS concat(x, 'p,q'), c AS 'x,'") ==
      Seq("a INT", "b AS concat(x, 'p,q')", "c AS 'x,'"))
  }

  test("regionEnd stops at top-level keywords, not in parens/literals/identifiers") {
    val s = "x = y AND f(a WHERE_ish, 'WHERE') WHERE z = 1"
    val end = SqlLexer.regionEnd(s, 0, Seq("WHERE"))
    assert(s.substring(end).startsWith("WHERE z"), s.substring(end))
    // unbalanced close ends the region (condition inside an outer paren)
    assert(SqlLexer.regionEnd("a = b) AND c", 0, Seq("WHERE")) == 5)
    // no stop: runs to end of text
    assert(SqlLexer.regionEnd("a = b AND c", 0, Seq("WHERE")) == 11)
  }

  test("front-ends stay correct on keyword-bearing literals") {
    // DDL computed column with comma+keyword inside a literal parses
    val t = Ddl.parse("""CREATE TABLE t (
        a BIGINT,
        lbl AS concat('g,roup by', a)
      ) WITH ('connector' = 'filesystem', 'path' = '/tmp/x', 'format' = 'parquet')""")
    assert(t.physical.map(_.name) == Seq("a"))
    assert(t.computed.map(_.name) == Seq("lbl"))
    assert(t.computed.head.sqlExpr == "concat('g,roup by', a)")
    // MATCH_RECOGNIZE DEFINE literal containing WITHIN does not mis-slice
    val spec = MatchRecognize.parse("""
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS x
        PATTERN (A B)
        WITHIN INTERVAL '5' MINUTE
        DEFINE A AS A.event_type = 'WITHIN', B AS B.event_type = 'purchase'
      )""")
    assert(spec.pattern.withinUs == 5L * 60000000)
    assert(spec.pattern.steps.map(_.name) == Vector("A", "B"))
  }
}
