package graft

/**
 * Decorrelation plan audits for the subquery gate rows: Catalyst must
 * rewrite correlated subqueries into joins — never per-row subquery
 * execution (the reference's FlinkSubQueryRemoveRule /
 * SubQueryDecorrelator produce the same join rewrites).
 */
class SubquerySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    graft.queries.SubqueryQueries.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("correlated scalar MAX decorrelates to an aggregate-join, no subquery in the plan") {
    val p = physical("subq_correlated_scalar")
    assert(!p.contains("Subquery"), s"subquery survived decorrelation:\n$p")
    assert(p.contains("HashAggregate") && p.contains("Join"),
      s"expected grouped-max + join rewrite:\n$p")
  }

  test("correlated scalar AVG in a predicate decorrelates to an aggregate-join") {
    val p = physical("subq_scalar_avg")
    assert(!p.contains("Subquery"), s"subquery survived decorrelation:\n$p")
  }

  test("IN predicates rewrite to semi joins") {
    val p = physical("subq_nested_in")
    assert(p.contains("LeftSemi"), s"IN not rewritten to semi join:\n$p")
  }

  test("NOT IN over a nullable subquery rewrites to a null-aware anti join") {
    val p = graft.queries.TpchQueries.queries("tpch_q16_parts_supplier")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT IN not an anti join:\n$p")
  }

  test("EXISTS / NOT EXISTS rewrite to semi and anti joins") {
    val p = physical("subq_exists_chain")
    assert(p.contains("LeftSemi"), s"EXISTS not a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$p")
  }
}
