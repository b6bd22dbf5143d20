package graft

import org.apache.spark.sql.functions._

/**
 * Physical-plan audits: the properties the 100-TB story depends on,
 * asserted from `.explain("formatted")` output so regressions in plan
 * shape fail CI — not just correctness (SURVEY §4.1/§4.2: pushdown,
 * broadcast choice, two-phase agg, top-k without global sort).
 */
class PlanAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("filters and projections push into the parquet scan") {
    val p = plan(Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity"))
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      s"projection not pruned:\n$p")
  }

  test("dim join broadcasts; fact-fact join shuffles") {
    val cust = Tables.load(spark, dir, "customer")
    val nat = Tables.load(spark, dir, "nation")
    val p1 = plan(cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey")))
    assert(p1.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p1")

    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val p2 = plan(li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey")))
    assert(p2.contains("SortMergeJoin"), s"expected sort-merge join:\n$p2")
  }

  test("aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan(Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag").agg(sum(floor(col("l_quantity") * 100))))
    val firstExchange = p.indexOf("Exchange")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && firstExchange >= 0, s"missing agg/exchange:\n$p")
    assert(p.indexOf("HashAggregate", firstExchange) > firstExchange,
      s"no final agg after exchange:\n$p")
    assert(firstAgg < firstExchange || p.substring(0, firstExchange).contains("HashAggregate"),
      s"no partial agg before exchange:\n$p")
  }

  test("orderBy + limit compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(Tables.load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc).limit(10))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("rank-filter Top-N uses WindowGroupLimit (per-group pushdown, no full-window materialization)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc)
    val p = plan(Tables.load(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3))
    assert(p.contains("WindowGroupLimit"), s"rank filter not pushed into WindowGroupLimit:\n$p")
  }

  test("neardup pair mining joins on banded LSH signatures, never all-pairs per cell") {
    val df = graft.queries.SimilarityQueries.queries("sim_neardup_pairs")(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"neardup plan fell back to all-pairs:\n$p")
    // the candidate join must key on the band signature, not just label
    assert(p.contains("sig"), s"banded signature not a join key:\n$p")
  }

  test("batch FOR SYSTEM_TIME AS OF plans as union+window, not a range join") {
    val df = graft.queries.JoinQueries.queries("join_asof_sql")(spark, dir)
    val p = plan(df)
    // the as-of rewrite must produce the linear window formulation —
    // no join operator at all (a naive range join would explode to
    // |left|x|right| per key before ranking)
    assert(!p.contains("Join"), s"as-of SQL fell back to a join:\n$p")
    assert(p.contains("Window"), s"window formulation missing:\n$p")
  }

  test("entry query broadcasts the filtered customer dim before the lineitem shuffle") {
    val p = plan(SparkEntry.entry(spark))
    assert(p.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$p")
    // the selective segment filter reaches the customer scan
    assert(p.contains("c_mktsegment"), s"segment filter missing:\n$p")
  }

  test("Q9 star join: part filter pushed to scan, dims broadcast, two-phase agg") {
    val p = plan(graft.queries.TpchQueries.queries("tpch_q9_product_profit")(spark, dir))
    assert(p.contains("StringContains(p_name,widget)"),
      s"part name filter not pushed to the scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"comma joins fell to cartesian:\n$p")
    // two-phase: final agg above the shuffle, partial below it (the
    // formatted plan prints top-down, so partial follows final in text)
    val finalAgg = p.indexOf("HashAggregate")
    val aggExchange = p.indexOf("Exchange", finalAgg)
    assert(finalAgg >= 0 && aggExchange > finalAgg &&
      p.indexOf("HashAggregate", aggExchange) > aggExchange,
      s"aggregate is not partial/final around the shuffle:\n$p")
  }

  test("Q11 threshold: scalar subquery evaluated once, not a join per row") {
    val p = plan(graft.queries.TpchQueries.queries("tpch_q11_important_stock")(spark, dir))
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      s"expected a hoisted scalar subquery:\n$p")
    assert(!p.contains("CartesianProduct"), s"threshold compare became a cartesian:\n$p")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val ord = Tables.load(spark, dir, "orders")
      .withColumn("o_year", expr("year(o_orderdate)"))
    ord.write.mode("overwrite").partitionBy("o_year").parquet(s"$base/orders_part")
    spark.read.parquet(s"$base/orders_part").createOrReplaceTempView("orders_part")
    ord.select(col("o_year")).distinct()
      .withColumn("pick", col("o_year") % 7)
      .write.mode("overwrite").parquet(s"$base/years")
    spark.read.parquet(s"$base/years").createOrReplaceTempView("years_dim")
    val df = spark.sql("""
      SELECT count(*) AS n FROM orders_part o JOIN years_dim y
        ON o.o_year = y.o_year WHERE y.pick = 1""")
    val p = plan(df)
    assert(p.contains("dynamicpruning") || p.contains("DynamicPruning"),
      s"no dynamic partition pruning on the fact scan:\n$p")
    assert(df.collect().head.getLong(0) > 0)
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bkt")
    Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bkt")
    try {
      // disable broadcast so the equi-join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(spark.table("li_bkt").join(spark.table("ord_bkt"),
        col("l_orderkey") === col("o_orderkey")))
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles — co-location lost:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }

  test("TPC-DS Q95 shape: both IN probes plan as semi joins, self-join stays equi") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q95_with_chain_semi")(spark, dir))
    // the two WITH-frame IN filters must become LeftSemi joins, not
    // inner joins + dedup (which would multiply the fact) and never a
    // cartesian; the multi_supp self-join must remain an equi-join
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"expected two semi joins for the IN chain:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lineitem self-join fell to all-pairs:\n$p")
  }

  test("TPC-DS Q23 shape: grouped-HAVING frames broadcast into semi joins over the fact") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q23_multi_with_cross")(spark, dir))
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"expected two semi joins for the WITH cross-filter:\n$p")
    // the aggregated WITH frames are far smaller than the fact — the
    // planner must broadcast them rather than shuffling lineitem twice
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"WITH frames not broadcast into the fact probes:\n$p")
  }

  test("TPC-DS Q67 shape: rollup rank-filter plans Expand with WindowGroupLimit above it") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q67_grouping_sets_topk")(spark, dir))
    assert(p.contains("Expand"), s"rollup lost its Expand node:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=5 filter not pushed into WindowGroupLimit:\n$p")
  }

  test("TPC-DS Q88 shape: single-row count scans cross via broadcast, no shuffle join") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q88_multi_scan_counts")(spark, dir))
    // each arm aggregates to one row; the cross product must be
    // broadcast nested loop (1-row sides), never SortMergeJoin
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast cross of 1-row aggregates:\n$p")
    assert(!p.contains("SortMergeJoin"), s"scalar cross product shuffled:\n$p")
  }

  test("TPC-DS Q14 shape: INTERSECT chain and IN probe plan as semi joins, no cartesian") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q14_cross_channel_intersect")(spark, dir))
    // two INTERSECTs + the IN probe: three LeftSemi joins over
    // deduplicated channel scans — never inner joins that multiply
    assert("LeftSemi".r.findAllIn(p).size >= 3,
      s"expected three semi joins (2 INTERSECT + IN):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"INTERSECT fell to all-pairs:\n$p")
  }

  test("PARTITIONED BY sink: the type filter prunes partitions statically at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_partaudit").toString
    graft.sqlx.Ddl.execute(spark,
      s"""CREATE TABLE paudit_src (
            event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE
          ) WITH ('connector' = 'filesystem',
                  'path' = '$dir/events.parquet', 'format' = 'parquet')""")
    graft.sqlx.Ddl.execute(spark,
      s"""CREATE TABLE paudit_sink (
            user_id BIGINT, cents BIGINT, event_type STRING
          ) PARTITIONED BY (event_type)
          WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'parquet')""")
    graft.sqlx.Ddl.execute(spark, """
      INSERT INTO paudit_sink
        SELECT user_id, cast(floor(value * 100) as bigint), event_type
        FROM paudit_src""")
    val p = plan(spark.sql(
      "SELECT count(*) FROM paudit_sink WHERE event_type = 'click'"))
    assert(p.contains("PartitionFilters") && "PartitionFilters: \\[[^\\]]*event_type".r
      .findFirstIn(p).isDefined,
      s"partition filter not applied at the scan:\n$p")
  }

  test("TPC-DS Q15/Q98 shapes: OR-disjunction keeps one scan; share uses one Window over the agg") {
    val p15 = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q15_or_disjunction")(spark, dir))
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p15).size == 1,
      s"disjunction split into a union of scans:\n$p15")
    val p98 = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q98_revenue_share")(spark, dir))
    assert("\\(\\d+\\) Window".r.findAllIn(p98).size == 1,
      s"expected exactly one Window for the partition share:\n$p98")
    // the formatted tree prints parents first: the Window (consumer)
    // must appear BEFORE the grouped aggregate it reads
    val firstAgg = p98.indexOf("HashAggregate")
    val firstWin = p98.indexOf("Window")
    assert(firstAgg >= 0 && firstWin >= 0 && firstWin < firstAgg,
      s"Window should sit above the grouped aggregate:\n$p98")
  }

  test("TPC-DS Q87 shape: EXCEPT chain plans anti joins over deduplicated channels") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q87_triple_except")(spark, dir))
    assert("LeftAnti".r.findAllIn(p).size >= 2,
      s"expected two anti joins for the EXCEPT chain:\n$p")
    assert(!p.contains("CartesianProduct"), s"EXCEPT fell to all-pairs:\n$p")
  }

  test("TPC-DS Q41 shape: the OR-of-AND EXISTS plans ONE semi join, not one per branch") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q41_or_tree_exists")(spark, dir))
    // count semi-join NODES (the tree line), not detail-section echoes
    assert("Join LeftSemi".r.findAllIn(p).size == 1,
      s"disjunctive EXISTS split into multiple probes:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlation key lost through the disjunction:\n$p")
  }

  test("TPC-DS Q94 shape: scalar count-distinct decorrelates to an aggregate join + anti join") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q94_ship_anti_semi")(spark, dir))
    assert(p.contains("LeftAnti"), s"NOT EXISTS returns leg lost its anti join:\n$p")
    // the correlated count(DISTINCT) must become a grouped aggregate
    // joined on the key — never a per-row subquery loop
    assert(p.contains("HashAggregate") && !p.contains("CartesianProduct"),
      s"correlated scalar subquery did not decorrelate:\n$p")
  }

  test("TPC-DS Q39 shape: one fact scan feeds the stats; the pair join is equi on (supp, month)") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q39_stdev_pairs")(spark, dir))
    // the flagged frame self-joins on sk + consecutive month — an
    // equi-join (mn2 = mn1 + 1 is an equi key after rewrite), never
    // a cartesian or theta-only nested loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"consecutive-month pair join fell to all-pairs:\n$p")
    // the date filter must reach the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate band not pushed to the scan:\n$p")
  }

  test("TPC-DS Q47 shape: all four window functions share one Window over the aggregate") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q47_window_family_dev")(spark, dir))
    // sum/count over (sk) and lag/lead over (sk ORDER BY mn) are
    // compatible partitions — at most two Window nodes over ONE
    // exchange of the monthly aggregate; a per-function window chain
    // would re-sort the frame four times
    assert("\\(\\d+\\) Window".r.findAllIn(p).size <= 2,
      s"window family split into per-function Window nodes:\n$p")
    assert("Exchange hashpartitioning\\(sk".r.findAllIn(p).size <= 1,
      s"window family re-shuffled the aggregate more than once:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate band not pushed to the scan:\n$p")
  }

  test("TPC-DS Q1 shape: correlated group-average subqueries decorrelate to aggregate joins") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q1_correlated_group_avg")(spark, dir))
    // both correlated scalar aggregates over the WITH frame must
    // decorrelate into grouped aggregates joined back on nk — never a
    // per-row re-execution (no nested-loop/cartesian in the plan)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated subqueries fell to per-row evaluation:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected decorrelated grouped aggregates:\n$p")
  }

  test("TPC-DS Q17 shape: three-fact chain joins stay equi with date-inequality residuals") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q17_three_fact_chain")(spark, dir))
    // both chain hops are equi-joins on ck with the date bound as a
    // residual condition — never a pure-theta nested loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chain joins fell to all-pairs:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"order-date windows not pushed to the orders scans:\n$p")
  }

  test("TPC-DS Q97 shape: channel overlap keeps the composite-key full outer join") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q97_channel_overlap_full")(spark, dir))
    // full outer can never broadcast; it must stay a shuffled equi-join
    // on (ck, pk) — and the DISTINCT frames must not fall to all-pairs
    assert(p.contains("FullOuter"), s"overlap join lost FullOuter:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap join fell to all-pairs:\n$p")
  }

  test("TPC-DS Q34 shape: count-bucket frame joins back to the dim via broadcast") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q34_count_buckets")(spark, dir))
    // the HAVING frame and customer dim are both tiny next to the
    // fact: the join back must be broadcast, never a second full
    // shuffle of the fact
    assert(p.contains("BroadcastHashJoin"),
      s"count-bucket join back to customer not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs in count-bucket plan:\n$p")
  }

  test("TPC-DS Q70 shape: rank within grouping level plans WindowGroupLimit above Expand") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q70_rollup_rank_partition")(spark, dir))
    assert(p.contains("Expand"), s"rollup lost its Expand node:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=5 filter not pushed into WindowGroupLimit:\n$p")
  }

  test("TPC-DS Q64 shape: cross-period CTE self-join stays an equi-join on the item") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q64_cross_period_self")(spark, dir))
    // the cnt-dominance predicate must ride as a residual on the pk
    // equi-join, never demote it to an all-pairs nested loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cross-period self-join fell to all-pairs:\n$p")
    // two grouped frames × partial+final = at least four aggregates; a
    // collapsed side would drop below that
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final grouped frames on both join sides:\n$p")
  }

  test("window dedup TVF: rn=1 filter plans WindowGroupLimit below and above the shuffle") {
    val p = plan(graft.queries.TimeWindowQueries.queries("win_window_dedup_tvf_sql")(spark, dir))
    // keep-first per (pane, user) must push into WindowGroupLimit —
    // partial before the exchange, final after — never materializing
    // the full window sort
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"window dedup not planned as partial+final WindowGroupLimit:\n$p")
  }

  test("TPC-DS Q93 shape: returns adjustment stays an equi left join, grouped returns broadcast") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q93_returns_adjust")(spark, dir))
    // the fact ⟕ returns join is equi on (okey, pkey) — never all-pairs;
    // the grouped returns frame is far smaller than the fact, so the
    // planner must broadcast it rather than shuffling lineitem for it
    assert(p.contains("LeftOuter"), s"returns adjustment lost its left join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"returns join fell to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"grouped returns frame not broadcast into the fact:\n$p")
  }

  test("TPC-DS Q66 shape: twelve channel-month pivots stay in one two-phase aggregate") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q66_channel_month_pivot")(spark, dir))
    // the CASE pivot is 13 conditional sums inside ONE partial+final
    // hash aggregate over the union scan — no Expand (it's not a
    // grouping set) and no join
    assert(!p.contains("Expand"), s"pivot planned as Expand instead of conditional sums:\n$p")
    assert("""\(\d+\) HashAggregate""".r.findAllIn(p).size <= 2,
      s"pivot split into more than partial+final aggregates:\n$p")
    assert(!p.contains("Join"), s"pivot grew an unexpected join:\n$p")
  }

  test("SQL join hints steer the strategy: BROADCAST and MERGE (reference query hints)") {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("li_hint")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("ord_hint")
    // BROADCAST hint forces a broadcast join even on the larger side
    val pb = plan(spark.sql(
      "SELECT /*+ BROADCAST(o) */ l_orderkey, o_orderpriority " +
      "FROM li_hint l JOIN ord_hint o ON l_orderkey = o_orderkey"))
    assert(pb.contains("BroadcastHashJoin"), s"BROADCAST hint ignored:\n$pb")
    // MERGE hint forces sort-merge where broadcast would otherwise win
    val pm = plan(spark.sql(
      "SELECT /*+ MERGE(o) */ l_orderkey, o_orderpriority " +
      "FROM li_hint l JOIN ord_hint o ON l_orderkey = o_orderkey"))
    assert(pm.contains("SortMergeJoin"), s"MERGE hint ignored:\n$pm")
  }

  test("APPROX_COUNT_DISTINCT estimates within rsd bounds of the exact count") {
    // reference BuiltInFunctionDefinitions APPROX_COUNT_DISTINCT
    // (HyperLogLog++ on both engines); default rsd 5% — assert a
    // generous 15% envelope so the test never flakes on a reseed
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.select(col("l_orderkey")).distinct().count()
    val approx = li.select(approx_count_distinct(col("l_orderkey")).as("a"))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("gap expressions stay inside WholeStageCodegen") {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "part").createOrReplaceTempView("part_audit")
    val p = plan(spark.sql(
      "SELECT is_alpha(p_name) a, split_index(p_type, ' ', 0) s FROM part_audit"))
    // formatted explain marks fused stages with "[codegen id : N]"
    assert(p.contains("codegen id"), s"no codegen stage:\n$p")
    assert("""\(\d+\) Project \[codegen id""".r.findFirstIn(p).isDefined,
      s"projection with gap expressions not codegen'd:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("CodegenFallback"),
      s"expression fell out of codegen:\n$p")
  }

  test("DSIR weights: the 64-row bucket table broadcasts into the per-doc join") {
    val p = plan(graft.queries.TextQueries.queries("text_dsir_weights")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"bucket join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"unexpected cartesian (the 1-row totals frame must broadcast):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join should appear — both joins broadcast:\n$p")
  }

  test("AQE splits skewed join partitions at runtime (the conf-gated 100-TB skew path)") {
    // The engine's skew story is salting (SkewJoin, gated) PLUS AQE's
    // runtime skew-join split for skew discovered only at execution —
    // this pins that the conf path actually re-plans: with thresholds
    // forced low, the hot key's partition must be marked skew=true in
    // the final adaptive SortMergeJoin.
    import org.apache.spark.sql.functions.{col, lit}
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // one hot key carries ~all rows; the other side is small but
      // non-broadcastable (threshold disabled)
      val left = spark.range(0, 60000).select(
        (col("id") % 1000 * lit(0) + 7L).as("k"), col("id").as("payload"))
      val right = (0L to 50L).toDF("k").withColumn("tag", col("k") * 2)
      val joined = left.join(right.hint("merge"), "k")
      // materialize through THIS QueryExecution (count() would build
      // its own) so AQE finalizes the inspected plan
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join (is the conf path broken?):\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("PQ ADC: codebook and lookup table broadcast; candidates never shuffle for scoring") {
    val p = plan(graft.queries.SimilarityQueries.queries("sim_pq_adc_topk")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"LUT join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"PQ scoring must be table lookups, not pairwise products:\n$p")
  }

  test("domain mix: constant max-quota conjunct keeps WindowGroupLimit eligible") {
    val p = plan(graft.operators.Sampling.mixDomains(
      Tables.load(spark, dir, "documents"), "lang", "doc_id",
      Map("en" -> 80, "de" -> 40, "es" -> 40, "fr" -> 20, "zh" -> 20)))
    assert(p.contains("WindowGroupLimit"),
      s"rank filter lost the per-partition group-limit optimization:\n$p")
  }

  test("TPC-DS Q69 shape: EXISTS + NOT EXISTS plan one semi and one anti join") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q69_channel_anti_demo")(spark, dir))
    assert(p.contains("LeftSemi"), s"EXISTS leg lost its semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS leg lost its anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"channel combo fell to all-pairs:\n$p")
  }

  test("TPC-DS Q77 shape: P&L rollup keeps Expand above full-outer-joined channel aggs") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q77_pnl_rollup")(spark, dir))
    assert(p.contains("Expand"), s"ROLLUP lost its Expand node:\n$p")
    assert(p.contains("FullOuter"), s"returns netting lost its full outer join:\n$p")
    assert(!p.contains("CartesianProduct"), s"channel union fell to all-pairs:\n$p")
  }

  test("TPC-DS Q11 shape: four-way yoy self-join stays equi on the customer key") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q11_yoy_preference")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"yoy self-join fell to all-pairs:\n$p")
    // the per-(customer, year, channel) frame must aggregate two-phase
    // before any of the four probes consume it
    assert(p.contains("HashAggregate"), s"yr frame not hash-aggregated:\n$p")
    assert("Join".r.findAllIn(p).size >= 3, s"expected the 4-way self-join:\n$p")
  }

  test("TPC-DS Q29 shape: three-fact chain joins stay equi with no all-pairs stage") {
    val p = plan(graft.queries.TpcdsShapeQueries.queries("tpcds_q29_three_fact_qty")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fact chain fell to all-pairs:\n$p")
    assert(p.contains("HashAggregate"), s"brand aggregate missing:\n$p")
  }

  test("TPC-DS Q16 shape: multi-supplier EXISTS plans a semi, returns a NOT EXISTS anti") {
    val p = plan(graft.queries.TpcdsShapeQueries2.queries("tpcds_q16_catalog_ship")(spark, dir))
    assert(p.contains("LeftSemi"), s"EXISTS self-join leg lost its semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS returns leg lost its anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"ship-confirmation fell to all-pairs:\n$p")
  }

  test("TPC-DS Q32 shape: windowed correlated scalars decorrelate into aggregate equi-joins") {
    val p = plan(graft.queries.TpcdsShapeQueries2.queries("tpcds_q32_excess_discount")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated scalar left an all-pairs stage:\n$p")
    // both scalars (count, sum) become per-part aggregates joined back in
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"scalar legs not decorrelated into aggregates:\n$p")
  }

  test("TPC-DS Q50 shape: sale-to-return self-join stays equi on the order key") {
    val p = plan(graft.queries.TpcdsShapeQueries2.queries("tpcds_q50_return_lag_buckets")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lag self-join fell to all-pairs:\n$p")
    assert(p.contains("l_orderkey"), s"order-key equi join missing:\n$p")
  }

  test("TPC-DS Q80 shape: promo NOT IN plans an anti join under the rollup Expand") {
    val p = plan(graft.queries.TpcdsShapeQueries2.queries("tpcds_q80_pnl_promo_anti")(spark, dir))
    assert(p.contains("LeftAnti"), s"promo exclusion lost its anti join:\n$p")
    assert(p.contains("LeftOuter"), s"line-level returns netting lost its left join:\n$p")
    assert(p.contains("Expand"), s"ROLLUP lost its Expand node:\n$p")
    assert(!p.contains("CartesianProduct"), s"P&L fell to all-pairs:\n$p")
  }

  test("containment dedup: candidate pairs come from the shingle equi-join, never all-pairs") {
    val p = plan(graft.queries.DedupQueries.queries("dedup_ngram_containment")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment pair mining fell to all-pairs:\n$p")
  }

  test("IVF-PQ top-k: codes probe a broadcast LUT on (cell, subspace, code) — no all-pairs") {
    val p = plan(graft.queries.SimilarityQueries.queries("sim_ivfpq_topk")(spark, dir))
    assert(!p.contains("CartesianProduct"), s"ADC scoring fell to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"LUT probe not a broadcast hash join:\n$p")
  }

  test("k-means iterate: both Lloyd assignments broadcast the centroid side, never shuffle it") {
    val p = plan(graft.queries.SimilarityQueries.queries("sim_kmeans_iterate")(spark, dir))
    assert(!p.contains("CartesianProduct"),
      s"centroid probe became a shuffled cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"k-centroid probe should be the deliberate broadcast nested loop:\n$p")
  }

  test("semantic dedup: no shuffled cartesian anywhere; assignment is the broadcast probe") {
    // the banded-signature candidate join runs before the label-prop
    // checkpoint cuts lineage (its shape is pinned by the
    // sim_neardup_pairs audit); what remains visible here is the
    // keeper join over the cached assignment — whose only nested-loop
    // stage must be the deliberate 8-centroid broadcast.
    val p = plan(graft.queries.SimilarityQueries.queries("dedup_semantic")(spark, dir))
    assert(!p.contains("CartesianProduct"), s"semantic dedup fell to all-pairs:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment should be the deliberate broadcast nested loop:\n$p")
  }

  test("TPC-H Q2 shape: the correlated MIN scalar decorrelates into an aggregate equi-join") {
    val p = plan(graft.queries.TpchQueries.queries("tpch_q2_min_cost_supplier")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated min left an all-pairs stage:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"min-cost leg not decorrelated into an aggregate:\n$p")
  }

  test("TPC-H Q21 shape: EXISTS and NOT EXISTS plan as semi and anti joins on one fact") {
    val p = plan(graft.queries.TpchQueries.queries("tpch_q21_waiting_suppliers")(spark, dir))
    assert(p.contains("LeftSemi"), s"other-supplier EXISTS lost its semi join:\n$p")
    assert(p.contains("LeftAnti"), s"also-late NOT EXISTS lost its anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"waiting-supplier plan fell to all-pairs:\n$p")
  }

  test("e2e training pipeline: decontamination is an anti join, no all-pairs anywhere") {
    val p = plan(graft.queries.TextQueries.queries("text_e2e_training_pipeline")(spark, dir))
    assert(p.contains("LeftAnti"), s"contamination filter lost its anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pipeline fell to all-pairs:\n$p")
  }

  test("TPC-DS Q84 shape: income-band range join broadcasts the 5-row literal dim") {
    val p = plan(graft.queries.TpcdsShapeQueries2.queries("tpcds_q84_income_band_chain")(spark, dir))
    // a non-equi probe of a literal 5-row dim should be broadcast
    // nested-loop (never a shuffled cartesian), with the returned-
    // purchase EXISTS staying a semi join
    assert(p.contains("BroadcastNestedLoopJoin"), s"band range join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"band join fell to a shuffled cartesian:\n$p")
    assert(p.contains("LeftSemi"), s"returned-purchase EXISTS lost its semi join:\n$p")
  }

  test("bucket gate: co-located join shuffles only the final rollup") {
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(graft.queries.BucketQueries.queries("bucket_colocated_join")(spark, dir))
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      // the join subtree must be exchange-free: the tree section lists
      // children below the join line, so no Exchange may appear after
      // the SortMergeJoin line before the details section
      val tree = p.split("\n\n", 2)(0)
      val joinAt = tree.indexOf("SortMergeJoin")
      assert(joinAt >= 0 && !tree.substring(joinAt).contains("Exchange"),
        s"bucketed join input still shuffles — co-location lost:\n$p")
      // above the join: exactly the rollup exchange + the presentation
      // range sort's (no extra repartition creeps in)
      assert("Exchange".r.findAllIn(tree).size == 2,
        s"expected exactly two exchanges (rollup + presentation sort):\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucket gate: grouping on the bucket key runs with no exchange below the histogram") {
    val p = plan(graft.queries.BucketQueries.queries("bucket_local_agg")(spark, dir))
    // per-orderkey agg satisfied by the scan's bucket partitioning: the
    // only exchanges are the second (histogram) agg's and the
    // presentation sort's — a third would mean the bucket-key agg
    // shuffled (splitsGroupedBy contract lost)
    val tree = p.split("\n\n", 2)(0)
    assert("Exchange".r.findAllIn(tree).size == 2,
      s"bucket-key aggregate shuffled — splitsGroupedBy contract lost:\n$p")
    assert(p.contains("Bucketed: true"), s"scan not recognized as bucketed:\n$p")
  }

  test("bucket gate: equality on the bucket key prunes to 1 of 8 buckets") {
    val p = plan(graft.queries.BucketQueries.queries("bucket_pruned_lookup")(spark, dir))
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning not applied:\n$p")
  }

  test("hamming rerank: stage 1 is the deliberate broadcast scan, stage 2 fetches via hash joins") {
    val p = plan(graft.queries.SimilarityQueries.queries("sim_hamming_rerank")(spark, dir))
    // the only nested-loop is the 10-query broadcast against the
    // packed sign words; the vector fetch for the 20-per-query
    // shortlist must be equi (hash) joins, never a second all-pairs
    val tree = p.split("\n\n", 2)(0)
    assert("BroadcastNestedLoopJoin".r.findAllIn(tree).size == 1,
      s"expected exactly the one deliberate broadcast scan stage:\n$p")
    assert(!p.contains("CartesianProduct"), s"rerank fell to a shuffled cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vector fetch not a hash join:\n$p")
  }

  test("MRL funnel: prefix stage broadcast-scans, full-dim rerank joins back equi") {
    val p = plan(graft.queries.SimilarityQueries.queries("sim_mrl_funnel")(spark, dir))
    val tree = p.split("\n\n", 2)(0)
    assert("BroadcastNestedLoopJoin".r.findAllIn(tree).size == 1,
      s"expected exactly the one deliberate prefix-scan stage:\n$p")
    assert(!p.contains("CartesianProduct"), s"funnel fell to a shuffled cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"full-vector fetch not a hash join:\n$p")
  }

  test("runtime bloom filter: a selective dim side injects might_contain into the fact scan") {
    // Spark's InjectRuntimeFilter (the runtime row-level semi-join
    // pre-filter — the 100-TB lever that skips fact rows whose key
    // cannot match a filtered dim) must fire on a shuffle join whose
    // build side is selective. Thresholds drop to fixture scale; the
    // conf keys are public SQLConf entries.
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.load(spark, dir, "lineitem")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = plan(li.join(ord, col("l_orderkey") === col("o_orderkey")))
      assert(p.contains("might_contain"),
        s"runtime bloom filter not injected into the probe side:\n$p")
    }
  }

  test("dynamic partition pruning: a filtered dim prunes the partitioned fact scan") {
    // the partition-pruning analog of the runtime bloom filter: when
    // the fact is PARTITIONED on the join key and the dim side is
    // selective, the scan must read only the partitions the dim
    // survives — at 100 TB this is the difference between scanning a
    // year and scanning a week. The dim filter is an aggregate HAVING
    // (not a literal on the join key), so static pruning cannot fold
    // it — only DPP's dynamicpruning subquery can.
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.load(spark, dir, "orders")
      .withColumn("opri", substring(col("o_orderpriority"), 1, 1))
      .write.mode("overwrite").partitionBy("opri").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    val dim = Tables.load(spark, dir, "orders")
      .groupBy(substring(col("o_orderpriority"), 1, 1).as("dpri"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") < 280) // keeps 1 of 5 priorities at this sf
    val p = plan(fact.join(dim, col("opri") === col("dpri")))
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the partitioned fact scan:\n$p")
  }

  test("sliced hop: the window fanout explodes the slice AGGREGATE, not the scan") {
    // the slice-sharing contract (reference SliceAssigners.hopping):
    // in the formatted (top-down) plan the Generate must sit BETWEEN
    // the final and the per-slice HashAggregate — an explode below
    // the first aggregate would mean raw rows fanned out ×overlap
    val p = plan(SparkEntry.queries("win_hop_sliced")(spark, dir))
    val gi = p.indexOf("Generate")
    val firstAgg = p.indexOf("HashAggregate")
    assert(gi > 0 && firstAgg >= 0 && firstAgg < gi,
      s"no aggregate above the fanout Generate:\n$p")
    assert(p.indexOf("HashAggregate", gi) > gi,
      s"no per-slice aggregate below the fanout Generate:\n$p")
  }
}
