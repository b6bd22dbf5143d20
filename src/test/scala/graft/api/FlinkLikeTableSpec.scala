package graft.api

import graft.SparkSuite

/**
 * Fluent Table API surface (reference Table.java string-expression
 * form): each method must behave exactly like its SQL twin, because
 * it IS the same Catalyst plan underneath.
 */
class FlinkLikeTableSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def te = new TableEnv(spark)

  private def nation: Table = {
    graft.Tables.load(spark, dir, "nation").createOrReplaceTempView("nation_ft")
    te.from("nation_ft")
  }

  test("select / filter / as / addColumns / renameColumns / dropColumns") {
    val t = nation
      .select("n_nationkey, n_name")
      .filter("n_nationkey < 5")
      .addColumns("length(n_name) AS name_len")
      .renameColumns("n_name AS nation_name")
      .dropColumns("n_nationkey")
    assert(t.df.columns.toSeq === Seq("nation_name", "name_len"))
    assert(t.df.count() === 5)
    val renamed = nation.select("n_nationkey, n_name").as("k, name")
    assert(renamed.df.columns.toSeq === Seq("k", "name"))
  }

  test("groupBy().select mixes keys and aggregates, output in select order") {
    val cust = {
      graft.Tables.load(spark, dir, "customer").createOrReplaceTempView("cust_ft")
      te.from("cust_ft")
    }
    val g = cust.groupBy("c_mktsegment")
      .select("count(1) AS n, c_mktsegment, max(c_custkey) AS max_key")
    assert(g.df.columns.toSeq === Seq("n", "c_mktsegment", "max_key"))
    val viaSql = spark.sql(
      """SELECT count(1) AS n, c_mktsegment, max(c_custkey) AS max_key
         FROM cust_ft GROUP BY c_mktsegment""")
    assert(g.df.orderBy("c_mktsegment").collect().toSeq ===
      viaSql.orderBy("c_mktsegment").collect().toSeq)
  }

  test("joins, set ops, orderBy suffix form, fetch") {
    val lo = nation.select("n_nationkey, n_name").filter("n_nationkey < 10")
    val hi = nation.select("n_nationkey, n_name").filter("n_nationkey >= 5")
    assert(lo.unionAll(hi).df.count() === nation.df.count() + 5)
    assert(lo.union(hi).df.count() === nation.df.count())
    assert(lo.intersect(hi).df.count() === 5)
    assert(lo.minus(hi).df.count() === 5)
    val j = lo.join(hi.as("k2, name2"), "n_nationkey = k2")
    assert(j.df.count() === 5)
    val top = nation.select("n_nationkey, n_name")
      .orderBy("n_nationkey.desc").fetch(3)
      .df.collect().map(_.getInt(0)).toSeq
    assert(top === top.sorted.reverse && top.length === 3)
    // left outer keeps unmatched probe rows
    val lj = lo.leftOuterJoin(hi.as("k2, name2"), "n_nationkey = k2")
    assert(lj.df.count() === 10)
    assert(lj.df.filter("k2 IS NULL").count() === 5)
  }

  test("malformed addColumns / renameColumns fail loudly") {
    intercept[IllegalArgumentException](nation.addColumns("n_nationkey + 1"))
    intercept[IllegalArgumentException](nation.renameColumns("n_name"))
  }
}
