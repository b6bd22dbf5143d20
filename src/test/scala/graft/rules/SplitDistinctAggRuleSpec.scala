package graft.rules

import graft.{SparkSuite, Tables}

/** The skew-split COUNT(DISTINCT) optimizer rule: fires only on the
 * narrow eligible shape, preserves results exactly, and stays inert
 * without its bucket config. */
class SplitDistinctAggRuleSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("rewrite fires when configured, preserves results, skips ineligible shapes") {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("li_split")
    val q = """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n
               FROM li_split GROUP BY l_returnflag ORDER BY l_returnflag"""
    val baseline = spark.sql(q).collect().toSeq
    spark.experimental.extraOptimizations = Seq(SplitDistinctAggRule())
    try {
      // without the bucket config the rule is inert
      assert(!spark.sql(q).queryExecution.optimizedPlan.toString.contains("__graft_salt"))
      spark.conf.set("spark.graft.distinctAggSplit.buckets", "8")
      val df = spark.sql(q)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_salt"), s"rule did not fire:\n$plan")
      assert(df.collect().toSeq == baseline, "split rewrite changed the result")
      // a mixed aggregate list (sum alongside the distinct count) is
      // out of the provable shape — left to stock Catalyst
      val multi = spark.sql("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS c,
                                      sum(l_quantity) AS s
                               FROM li_split GROUP BY l_returnflag""")
      assert(!multi.queryExecution.optimizedPlan.toString.contains("__graft_salt"),
        "rule fired on an ineligible aggregate list")
      // a SECOND count-distinct over an expression is equally out of
      // shape (its child column would vanish from the salted inner agg)
      val twoDistinct = spark.sql(
        """SELECT l_returnflag, count(DISTINCT l_orderkey) AS c1,
                  count(DISTINCT l_suppkey + 1) AS c2
           FROM li_split GROUP BY l_returnflag""")
      assert(!twoDistinct.queryExecution.optimizedPlan.toString.contains("__graft_salt"),
        "rule fired with a second distinct aggregate present")
      assert(twoDistinct.collect().nonEmpty) // and the plan still runs
      // a GLOBAL distinct count over empty input must stay 0, not NULL
      val empty = spark.sql(
        "SELECT count(DISTINCT l_orderkey) AS n FROM li_split WHERE l_orderkey < 0")
      assert(empty.queryExecution.optimizedPlan.toString.contains("__graft_salt"),
        "global shape should fire")
      assert(empty.collect().toList.map(_.getLong(0)) == List(0L))
    } finally {
      spark.conf.unset("spark.graft.distinctAggSplit.buckets")
      spark.experimental.extraOptimizations = Nil
    }
  }
}
