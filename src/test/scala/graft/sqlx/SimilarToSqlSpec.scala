package graft.sqlx

import graft.SparkSuite

/** SIMILAR TO translation + SQL-text desugar (reference
 * StringCallGen.scala:74-76 SIMILAR_TO / NOT_SIMILAR_TO). */
class SimilarToSqlSpec extends SparkSuite {

  test("pattern translation: wildcards, shared syntax, literalized regex chars") {
    assert(SimilarToSql.toJavaRegex("ab%") == "^(?:ab.*)$")
    assert(SimilarToSql.toJavaRegex("a_c") == "^(?:a.c)$")
    assert(SimilarToSql.toJavaRegex("(cl|pu)%") == "^(?:(cl|pu).*)$")
    assert(SimilarToSql.toJavaRegex("[a-z]+x{2,3}") == "^(?:[a-z]+x{2,3})$")
    // regex specials that are SIMILAR literals get escaped
    assert(SimilarToSql.toJavaRegex("a.b$c^d\\e") == "^(?:a\\.b\\$c\\^d\\\\e)$")
    // % and _ inside a character class stay literal class members
    assert(SimilarToSql.toJavaRegex("[%_]x") == "^(?:[%_]x)$")
  }

  test("escape character makes wildcards and specials literal") {
    assert(SimilarToSql.toJavaRegex("100\\%", Some('\\')) == "^(?:100%)$")
    assert(SimilarToSql.toJavaRegex("a!_b", Some('!')) == "^(?:a_b)$")
    assert(SimilarToSql.toJavaRegex("a!|b", Some('!')) == "^(?:a\\|b)$")
    intercept[IllegalArgumentException](SimilarToSql.toJavaRegex("oops!", Some('!')))
    intercept[IllegalArgumentException](SimilarToSql.toJavaRegex("[abc"))
  }

  test("desugar rewrites infix forms and leaves literals alone") {
    val q = SimilarToSql.desugar("SELECT x SIMILAR TO 'a%' AS m FROM t")
    assert(q == "SELECT (regexp_like(x, '^(?:a.*)$')) AS m FROM t")
    val nq = SimilarToSql.desugar("SELECT a.b NOT SIMILAR TO 'a%' FROM t")
    assert(nq == "SELECT (NOT regexp_like(a.b, '^(?:a.*)$')) FROM t")
    val fq = SimilarToSql.desugar("SELECT lower(x) SIMILAR TO '_' FROM t")
    assert(fq == "SELECT (regexp_like(lower(x), '^(?:.)$')) FROM t")
    val eq = SimilarToSql.desugar("SELECT x SIMILAR TO 'a!%' ESCAPE '!' FROM t")
    assert(eq == "SELECT (regexp_like(x, '^(?:a%)$')) FROM t")
    // keyword inside a string literal is untouched
    val lit = "SELECT 'x SIMILAR TO y' AS s FROM t"
    assert(SimilarToSql.desugar(lit) == lit)
    // multiple occurrences all rewrite
    val multi = SimilarToSql.desugar(
      "SELECT x SIMILAR TO 'a%' AS p, y SIMILAR TO 'b_' AS q FROM t")
    assert(multi.contains("regexp_like(x, '^(?:a.*)$')") &&
      multi.contains("regexp_like(y, '^(?:b.)$')"))
    // non-literal pattern fails loudly
    intercept[IllegalArgumentException](
      SimilarToSql.desugar("SELECT x SIMILAR TO y FROM t"))
  }

  test("end-to-end: SIMILAR TO matches whole strings through the SQL door") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq("click", "purchase", "view").toDF("v").createOrReplaceTempView("st_t")
    val env = new graft.api.TableEnv(spark)
    val r = env.sqlQuery(
      """SELECT v, v SIMILAR TO '(cl|pu)%' AS a,
                v SIMILAR TO 'vie' AS partial,
                similar_to(v, 'v__w') AS fn
         FROM st_t ORDER BY v""")
      .as[(String, Boolean, Boolean, Boolean)].collect().toList
    assert(r == List(("click", true, false, false),
      ("purchase", true, false, false), ("view", false, false, true)))
  }
}
