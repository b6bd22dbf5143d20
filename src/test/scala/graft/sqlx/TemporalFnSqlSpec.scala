package graft.sqlx

import org.scalatest.funsuite.AnyFunSuite

/** LATERAL TABLE temporal-function desugar (reference
 * TemporalTableFunction → LogicalCorrelateToJoinFromTemporalTableRule). */
class TemporalFnSqlSpec extends AnyFunSuite {

  TemporalFnSql.registerTemporalFunction(
    "rates_fn_spec", "rates_hist_spec", "r_ts", "r_seq", "r_currency")

  test("comma-join LATERAL TABLE lowers to FOR SYSTEM_TIME AS OF with the lifted key") {
    val q = TemporalFnSql.desugar(
      "SELECT o.amount FROM orders o, LATERAL TABLE (rates_fn_spec(o.rowtime)) AS r " +
        "WHERE o.currency = r.r_currency AND o.amount > 2")
    assert(q.contains(
      "JOIN rates_hist_spec FOR SYSTEM_TIME AS OF o.rowtime AS r ON r.r_currency = o.currency"))
    // the WHERE keeps its shape with the equality neutralized
    assert(q.contains("WHERE (1=1) AND o.amount > 2"))
    assert(!q.toUpperCase.contains("LATERAL TABLE"))
  }

  test("key equality matches in either orientation") {
    val q = TemporalFnSql.desugar(
      "SELECT 1 FROM o, LATERAL TABLE (rates_fn_spec(o.ts)) r WHERE r.r_currency = o.cur")
    assert(q.contains("ON r.r_currency = o.cur"))
  }

  test("unregistered function and missing key equality fail loudly") {
    intercept[IllegalArgumentException](TemporalFnSql.desugar(
      "SELECT 1 FROM o, LATERAL TABLE (nope_fn(o.ts)) r WHERE r.k = o.k"))
    intercept[IllegalArgumentException](TemporalFnSql.desugar(
      "SELECT 1 FROM o, LATERAL TABLE (rates_fn_spec(o.ts)) r WHERE o.amount > 2"))
  }
}
