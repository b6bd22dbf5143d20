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
    // orderBy().offset(o).fetch(n) — the reference pagination triple
    val page = nation.select("n_nationkey")
      .orderBy("n_nationkey.asc").offset(2).fetch(3)
      .df.collect().map(_.getInt(0)).toSeq
    assert(page === Seq(2, 3, 4), s"offset/fetch slice wrong: $page")
    // left outer keeps unmatched probe rows
    val lj = lo.leftOuterJoin(hi.as("k2, name2"), "n_nationkey = k2")
    assert(lj.df.count() === 10)
    assert(lj.df.filter("k2 IS NULL").count() === 5)
  }

  test("malformed addColumns / renameColumns fail loudly") {
    intercept[IllegalArgumentException](nation.addColumns("n_nationkey + 1"))
    intercept[IllegalArgumentException](nation.renameColumns("n_name"))
  }

  test("fluent group windows: Slide and Session equal their DataFrame twins") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, dir, "events")
    ev.createOrReplaceTempView("events_ft")
    // Slide.over.every == window(ts, size, slide)
    val slide = te.from("events_ft")
      .window(Slide.over("30.minutes").every("10.minutes").on("ts").as("w"))
      .groupBy("w, event_type")
      .select("w.start AS ws, event_type, count(1) AS n")
      .toDataFrame.collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2))).toSet
    val slideTwin = ev
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)))
      .collect().map(r => (String.valueOf(r.getStruct(0).get(0)),
        r.getString(1), r.getLong(2))).toSet
    assert(slide == slideTwin)
    // Session.withGap == session_window(ts, gap); w.end resolves too
    val sess = te.from("events_ft").filter("user_id = 1")
      .window(Session.withGap("10.minutes").on("ts").as("w"))
      .groupBy("w")
      .select("w.start AS ws, w.end AS we, count(1) AS n")
      .toDataFrame.collect()
      .map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1)), r.getLong(2))).toSet
    val sessTwin = ev.filter(col("user_id") === 1)
      .groupBy(session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)))
      .collect().map(r => (String.valueOf(r.getStruct(0).get(0)),
        String.valueOf(r.getStruct(0).get(1)), r.getLong(1))).toSet
    assert(sess == sessTwin)
    // bad duration spelling fails loudly, as does a groupBy missing the alias
    intercept[IllegalArgumentException](
      te.from("events_ft").window(Tumble.over("10.rows").on("ts").as("w"))
        .groupBy("w").select("count(1) AS n").toDataFrame.collect())
    intercept[IllegalArgumentException](
      te.from("events_ft").window(Tumble.over("10.minutes").on("ts").as("w"))
        .groupBy("event_type"))
  }

  test("FLIP-29 row ops: map replaces the row, flatMap explodes, lateral joins correlate") {
    Udfs.register2(spark, "shape_ft", new graft.queries.ExampleFns.DocShape)
    Udfs.registerTable(spark, "words_ft", new graft.queries.ExampleFns.WordsWithIdx)
    import spark.implicits._
    val docs = Seq((1L, "alpha bb c"), (2L, ""), (3L, "dd ee")).toDF("id", "txt")
    val t = te.fromDataFrame(docs)

    // map: output columns REPLACE the row; AS (...) renames positionally
    val m = t.map("shape_ft(id, txt) AS (id, n_tok, n_chr)")
    assert(m.df.columns.toSeq === Seq("id", "n_tok", "n_chr"))
    assert(m.df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 3L), (2L, 1L), (3L, 2L)))

    // flatMap: rows replaced by the table function's collected rows
    val fm = t.filter("id = 1").flatMap("words_ft(txt) AS (word, idx, wlen)")
    assert(fm.df.columns.toSeq === Seq("word", "idx", "wlen"))
    assert(fm.df.orderBy("idx").collect().map(_.getString(0)).toSeq ===
      Seq("alpha", "bb", "c"))

    // joinLateral keeps input columns and drops empty-result rows;
    // leftOuterJoinLateral null-extends them instead
    val inner = t.joinLateral("words_ft(txt) AS (word, idx, wlen)")
    assert(inner.df.columns.toSeq === Seq("id", "txt", "word", "idx", "wlen"))
    // "" splits to one empty token, so use a function-empty case: filter first
    val emptyFn = t.joinLateral("filter(words_ft(txt), w -> w._3 >= 2) AS (word, idx, wlen)")
    assert(emptyFn.df.filter("id = 2").count() === 0)
    val outer = t.leftOuterJoinLateral("filter(words_ft(txt), w -> w._3 >= 2) AS (word, idx, wlen)")
    assert(outer.df.filter("id = 2 AND word IS NULL").count() === 1)

    // atomic map output becomes f0
    val atomic = t.map("length(txt)")
    assert(atomic.df.columns.toSeq === Seq("f0"))

    // AS(...) arity mismatch is loud
    intercept[IllegalArgumentException](t.map("shape_ft(id, txt) AS (a, b)").df.collect())
  }

  test("FLIP-29 aggregate / flatAggregate through the fluent chain") {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("top2_ft", udaf(new graft.queries.ExampleFns.Top2))
    import spark.implicits._
    val vals = Seq(("a", 5L), ("a", 9L), ("a", 7L), ("b", 4L)).toDF("k", "v")
    val fa = te.fromDataFrame(vals).groupBy("k")
      .flatAggregate("top2_ft(v) AS (top_v, rk)")
      .select("k, top_v, rk")
      .orderBy("k, rk")
    assert(fa.df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq(("a", 9L, 1), ("a", 7L, 2), ("b", 4L, 1)))
    val ag = te.fromDataFrame(vals).groupBy("k")
      .aggregate("sum(v) AS sv")
      .select("k, sv")
      .orderBy("k")
    assert(ag.df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 21L), ("b", 4L)))
  }

  test("fluent OVER windows: n.rows frame equals the DataFrame twin; bad preceding is loud") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, dir, "events")
    ev.createOrReplaceTempView("events_ft2")
    val got = te.from("events_ft2")
      .window(Over.partitionBy("user_id").orderBy("event_id")
        .preceding("2.rows").as("w"))
      .select("user_id, event_id, count(1) OVER w AS n3")
      .toDataFrame.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id")).rowsBetween(-2, 0)
    val twin = ev.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == twin)
    intercept[IllegalArgumentException](
      Over.partitionBy("user_id").orderBy("ts").preceding("10.minutes").as("w"))
  }
}
