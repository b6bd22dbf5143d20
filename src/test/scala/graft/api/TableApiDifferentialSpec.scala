package graft.api

import graft.{SparkSuite, Tables}

/** Differential fuzzer for the fluent Table API: random pipelines
 * (filter conjuncts, computed columns, optional dim join, random
 * aggregate sets over random grouping keys, pagination) are built
 * simultaneously as a fluent chain AND as SQL text — the facade is a
 * veneer over the same Catalyst, so the rows must match exactly. The
 * fuzzed axes are the string-expression surfaces: comma splitting,
 * alias handling, key/aggregate classification in groupBy().select(),
 * the orderBy suffix form, and the offset/fetch pagination triple. */
class TableApiDifferentialSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("random fluent pipelines equal their composed SQL twins") {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("cust_fz")
    Tables.load(spark, dir, "nation").createOrReplaceTempView("nat_fz")
    val te = new TableEnv(spark)
    val rnd = new scala.util.Random(20260815L)

    for (case_ <- 0 until 20) {
      // --- random ingredients -------------------------------------
      val balPred = if (rnd.nextBoolean()) Some(1000 + rnd.nextInt(8000)) else None
      val natPred = if (rnd.nextBoolean()) Some(5 + rnd.nextInt(20)) else None
      val withJoin = rnd.nextBoolean()
      val keys = if (withJoin && rnd.nextBoolean()) Seq("c_mktsegment", "n_name")
                 else Seq("c_mktsegment")
      val aggPool = Seq(
        "count(1) AS n" -> "count(1) AS n",
        "sum(cents) AS sum_cents" -> "sum(cents) AS sum_cents",
        "max(c_custkey) AS max_key" -> "max(c_custkey) AS max_key",
        "min(cents) AS min_cents" -> "min(cents) AS min_cents")
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
      val page = if (rnd.nextBoolean()) Some((rnd.nextInt(4), 1 + rnd.nextInt(6))) else None

      // --- fluent chain -------------------------------------------
      var t = te.from("cust_fz")
        .select("c_custkey, c_nationkey, c_acctbal, c_mktsegment")
        .addColumns("floor(c_acctbal * 100) AS cents")
      balPred.foreach(b => t = t.filter(s"c_acctbal > $b"))
      natPred.foreach(k => t = t.where(s"c_nationkey < $k"))
      if (withJoin)
        t = t.join(te.from("nat_fz").select("n_nationkey, n_name"),
          "c_nationkey = n_nationkey")
      var out = t.groupBy(keys.mkString(", "))
        .select((keys ++ aggs.map(_._1)).mkString(", "))
        .orderBy(keys.map(_ + ".asc").mkString(", "))
      page.foreach { case (o, n) => out = out.offset(o).fetch(n) }

      // --- SQL twin -----------------------------------------------
      val preds = balPred.map(b => s"c_acctbal > $b").toSeq ++
        natPred.map(k => s"c_nationkey < $k")
      val whereSql = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
      val base = s"(SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment," +
        s" floor(c_acctbal * 100) AS cents FROM cust_fz$whereSql)"
      val fromSql = if (withJoin)
        s"$base c JOIN (SELECT n_nationkey, n_name FROM nat_fz) n ON c_nationkey = n_nationkey"
      else s"$base c"
      val pageSql = page.map { case (o, n) => s" LIMIT $n OFFSET $o" }.getOrElse("")
      val sql = s"SELECT ${(keys ++ aggs.map(_._2)).mkString(", ")} FROM $fromSql" +
        s" GROUP BY ${keys.mkString(", ")} ORDER BY ${keys.mkString(", ")}$pageSql"

      val got = out.toDataFrame.collect().map(_.toSeq.map(String.valueOf)).toSeq
      val want = spark.sql(sql).collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(got == want,
        s"case $case_ diverged\nfluent: $got\nsql: $want\nquery: $sql")
    }
  }
}
