package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Gelly-analog graph loops (SURVEY §7.1 `graph/`; reference
 * `flink-libraries/flink-gelly/.../Graph.java:1901-2003`
 * scatter-gather / gather-sum-apply iterations, and DataSet bulk
 * iterations `DataSet.java:1181`): vertices and edges are DataFrames,
 * iteration is a driver-side loop of joins — the GraphFrames/Pregel
 * shape.
 *
 * Scale notes: each round is two shuffles (message join + vertex
 * update); every round's state is eagerly materialized with
 * `localCheckpoint` so no round's joins are recomputed by later rounds
 * and plans don't grow unboundedly — the standard iterative-DataFrame
 * discipline at cluster scale. Round t-1's checkpoint blocks are freed
 * EXPLICITLY once round t materializes (waiting for the ContextCleaner
 * would let dead rounds pressure the block manager for the rest of the
 * job).
 *
 * `localCheckpoint` is NOT fault-tolerant: it truncates lineage, so an
 * executor loss mid-loop kills the job. For long loops on a real
 * cluster set `spark.graft.pregel.reliableCheckpoint=true` (and
 * `sparkContext.setCheckpointDir(...)`) to write rounds to reliable
 * storage instead — slower per round, survives executor loss (the
 * trade-off the reference resolves with its checkpointed iterative
 * tasks).
 */
object Pregel {

  /** Round materialization: localCheckpoint by default; reliable
   * checkpoint when `spark.graft.pregel.reliableCheckpoint=true`. */
  private def ckpt(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.pregel.reliableCheckpoint")
        .contains("true")) df.checkpoint()
    else df.localCheckpoint()

  /** Free a finished round's localCheckpoint blocks eagerly (no-op for
   * reliable checkpoints — their cleanup is directory-based). */
  private def free(df: DataFrame): Unit =
    org.apache.spark.sql.graft.SqlShim.checkpointRdd(df)
      .foreach(_.unpersist(blocking = false))

  /** Hash-partition a loop-persisted edge frame on its per-round join
   * key when `spark.graft.graph.partitionEdges=true` (guide §2.4): the
   * iterative drivers below join the SAME edge frame every round, and a
   * frame persisted with the join's partitioning is never re-exchanged
   * — without it each round re-shuffles the edge side (the big side of
   * a graph at scale: |E| ≫ |V|) while only the small vertex state
   * changes. Default OFF: below the broadcast threshold the per-round
   * joins broadcast the state side and never shuffle edges anyway, so
   * the up-front repartition is pure overhead at bench scale (measured
   * +20-35% per loop query at sf0.1); on a cluster where vertex state
   * exceeds the broadcast threshold, set it to true. Plan shape under
   * the flag is pinned by PregelPartitionSpec. */
  private def partitionEdges(df: DataFrame, key: String): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.graph.partitionEdges")
        .contains("true")) df.repartition(col(key))
    else df

  /**
   * Generic Pregel / scatter-gather driver (reference Gelly
   * `Graph.runScatterGatherIteration` / `runGatherSumApplyIteration`,
   * `Graph.java:1901-2003`): per round,
   *
   *   messages  = sendMsg over (edges ⋈ source state)   — scatter
   *   inbox     = merge(messages) grouped by dst        — sum
   *   state'    = vprog(state, inbox)                   — apply
   *
   * `vertices` is (id, state); `edges` is (src, dst [, attrs]); inside
   * `sendMsg` the source vertex's state is visible as `src_state` and
   * the edge's columns by name. `vprog` sees (old state, merged inbox
   * — null for vertices with no messages). Every concrete algorithm
   * below is a one-line instantiation.
   */
  def pregel(vertices: DataFrame, edges: DataFrame, rounds: Int,
      sendMsg: Column, merge: Column => Column,
      vprog: (Column, Column) => Column): DataFrame = {
    var state = vertices.select(col("id"), col("state"))
    var prevRound: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      val msgs = edges
        .join(state.select(col("id").as("src"), col("state").as("src_state")), Seq("src"))
        .select(col("dst").as("id"), sendMsg.as("msg"))
        .groupBy(col("id"))
        .agg(merge(col("msg")).as("inbox"))
      // eager per-round materialization: later rounds reuse this
      // round's blocks instead of recomputing the whole join chain
      state = ckpt(state.join(msgs, Seq("id"), "left")
        .select(col("id"), vprog(col("state"), col("inbox")).as("state")))
      // round t materialized -> round t-1's blocks are dead; free them
      prevRound.foreach(free)
      prevRound = Some(state)
    }
    state
  }

  /** Min-label propagation for `rounds` FIXED rounds over an undirected
   * edge list (src, dst): label := min(label, neighbors' labels).
   * With rounds >= graph diameter this is connected components
   * (labels = min vertex id in the component). Fixed rounds keep the
   * result exactly reproducible by the SQL oracle. */
  def minLabelPropagation(vertices: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    // undirected: send messages both ways. Persisted HASH-PARTITIONED
    // ON src (the per-round join key): every round joins this frame on
    // src, and a frame persisted with the join's partitioning is never
    // re-exchanged — without it each round re-shuffles the (large at
    // scale) edge side while only the (small) vertex-state side
    // actually changes (guide §2.4: keyed ops share one exchange).
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(partitionEdges(_, "src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val st = pregel(
      vertices.select(col("id"), col("id").as("state")), undirected, rounds,
      sendMsg = col("src_state"),
      merge = min,
      vprog = (s, m) => least(s, coalesce(m, s)))
    // materialize the projection before freeing the loop's final round
    // and the edge blocks
    val out = ckpt(st.select(col("id"), col("state").as("label")))
    free(st)
    undirected.unpersist()
    out
  }

  /** PageRank in integer fixed-point: ranks are longs at scale 10⁹ and
   * every step floors through BIGINT division (`div`), so two engines
   * running the same recurrence produce BIT-IDENTICAL integers —
   * cross-engine hash equality without float trust:
   *
   *   rank₀ = 10⁹ div n
   *   rankₜ₊₁ = (0.15·10⁹) div n + (85 · Σ_{u→v} rankₜ(u) div deg(u)) div 100
   */
  def pageRankFixed(vertices: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val n = vertices.count()
    // One repartition(src) up front: the degree aggregate, the
    // degree-attach join, AND every round's message join are all keyed
    // on src, so they share this single exchange — the persisted frame
    // keeps HashPartitioning(src) and rounds never re-shuffle the edge
    // side (guide §2.4).
    val pedges = partitionEdges(edges, "src")
    val degEdges = pedges
      .join(pedges.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val st = pregel(
      vertices.select(col("id"), lit(1000000000L / n).as("state")), degEdges, iters,
      sendMsg = expr("src_state div deg"),
      merge = sum,
      vprog = (_, m) => lit(150000000L / n) + expr("(85 * coalesce(inbox, 0L)) div 100"))
    val out = ckpt(st.select(col("id"), col("state").as("rankq")))
    free(st)
    degEdges.unpersist()
    out
  }

  /** Standard PageRank, fixed iterations, damping 0.85. Kept exactly
   * deterministic per-engine run (pure joins/aggregations); cross-engine
   * float equality is NOT promised — validated by spec on a known
   * graph (the fixed-point variant above is the hash-gated one). */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val n = vertices.count().toDouble
    // same single-exchange layout as pageRankFixed
    val pedges = partitionEdges(edges, "src")
    val degEdges = pedges
      .join(pedges.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val st = pregel(
      vertices.select(col("id"), lit(1.0 / n).as("state")), degEdges, iters,
      sendMsg = col("src_state") / col("deg"),
      merge = sum,
      vprog = (_, m) => lit((1 - damping) / n) + lit(damping) * coalesce(m, lit(0.0)))
    val out = ckpt(st.select(col("id"), col("state").as("rank")))
    free(st)
    degEdges.unpersist()
    out
  }

  /** Community detection by most-frequent-label propagation (reference
   * `flink-gelly/.../library/LabelPropagation.java:39-46`): each round
   * every vertex adopts the label MOST FREQUENT among its neighbors'
   * labels, ties broken by the GREATER label; vertices with no
   * neighbors keep their label. Fixed `rounds` keep the result exactly
   * reproducible by an unrolled SQL oracle (the reference's own caveat
   * applies: convergence is initialization-dependent, so fixed rounds
   * are the deterministic contract).
   *
   * Scale: per round one message shuffle + one (id, label) count + a
   * per-vertex top-1 window — all key-partitioned; no vertex's
   * neighbor list is ever collected. */
  def labelPropagationMostFrequent(vertices: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // hash-partitioned on src, the per-round join key — see
    // minLabelPropagation
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(partitionEdges(_, "src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var state = vertices.select(col("id"), col("id").as("label"))
    var prevRound: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      val freq = undirected
        .join(state.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val pick = freq
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("cnt").desc, col("label").desc)))
        .filter(col("rn") === 1)
        .select(col("id"), col("label").as("new_label"))
      state = ckpt(state.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_label"), col("label")).as("label")))
      prevRound.foreach(free)
      prevRound = Some(state)
    }
    undirected.unpersist()
    state
  }

  /** Community detection with hop attenuation (reference
   * `flink-gelly/.../library/CommunityDetection.java:36-72`, after
   * Leung et al., arXiv:0808.2633): vertex state is (label, score),
   * initialized (id, 1.0). Per round each vertex sums the received
   * scores per label, adopts the label with the HIGHEST SUM (ties →
   * smallest label, the reference's ascending-TreeMap + strict-greater
   * scan), takes that label's best single received score, and — when
   * the label CHANGED — attenuates it by delta/superstep. Messageless
   * vertices keep their state.
   *
   * Scores run in integer fixed-point at scale 10⁶ (delta 0.5 →
   * 500 000; the per-round attenuation floors through `div t`), so the
   * whole recurrence is exact integer arithmetic — the documented
   * quantization of the reference's double scores, hash-reproducible
   * by the unrolled SQL oracle.
   *
   * Scale: per round one message shuffle + one (id, label) aggregate +
   * a per-vertex top-1 window, all key-partitioned. */
  def communityDetection(vertices: DataFrame, edges: DataFrame, rounds: Int,
      deltaQ: Long = 500000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // hash-partitioned on src, the per-round join key — see
    // minLabelPropagation
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(partitionEdges(_, "src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var state = vertices.select(col("id"), col("id").as("label"),
      lit(1000000L).as("scoreq"))
    var prevRound: Option[DataFrame] = None
    for (t <- 1 to rounds) {
      val perLabel = undirected
        .join(state.select(col("id").as("src"), col("label"), col("scoreq")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(sum(col("scoreq")).as("total"), max(col("scoreq")).as("best"))
      val pick = perLabel
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("total").desc, col("label"))))
        .filter(col("rn") === 1)
        .select(col("id"), col("label").as("nl"), col("best"))
      state = ckpt(state.join(pick, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("nl"), col("label")).as("new_label"),
          when(col("nl").isNull, col("scoreq"))
            .when(col("nl") === col("label"), col("best"))
            .otherwise(col("best") - lit(deltaQ / t)).as("new_scoreq"),
          col("label"), col("scoreq"))
        .select(col("id"), col("new_label").as("label"), col("new_scoreq").as("scoreq")))
      prevRound.foreach(free)
      prevRound = Some(state)
    }
    undirected.unpersist()
    state
  }

  /** HITS hubs-and-authorities (reference
   * `flink-gelly/.../library/linkanalysis/HITS.java:55-60`, Kleinberg)
   * in integer fixed-point over a DIRECTED edge list: per round
   *
   *   auth(v) = Σ_{u→v} hub(u), then auth := auth·10⁹ div max(auth)
   *   hub(u)  = Σ_{u→v} auth(v), then hub := hub·10⁹ div max(hub)
   *
   * Normalization divergence, documented: the reference scales by the
   * L2 norm (sum-of-squares, `HITS.java:166-199`); we scale by the
   * MAX so every step stays in floored BIGINT arithmetic and two
   * engines produce bit-identical longs. Rankings and score RATIOS are
   * identical under either scaling (both are a positive scalar
   * multiple per round).
   *
   * Scale: two key-partitioned shuffles per round plus a scalar max —
   * the max is an AGGREGATE broadcast back into the plan (crossJoin of
   * a 1-row frame), never a driver collect. */
  def hitsFixed(edges: DataFrame, rounds: Int): DataFrame = {
    // TWO persisted copies, one per join key: every round joins the
    // edge list on src (auth step) AND on dst (hub step) — a copy
    // hash-partitioned per key means neither join ever re-shuffles
    // edges inside the loop (one extra |E| of storage buys 2·rounds
    // edge shuffles; guide §2.4).
    val e = edges.select(col("src"), col("dst")).distinct()
      .transform(partitionEdges(_, "src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eByDst =
      if (e.sparkSession.conf.getOption("spark.graft.graph.partitionEdges")
          .contains("true"))
        e.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
      else e
    val vertices = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    var state = ckpt(vertices
      .select(col("id"), lit(1000000000L).as("hubq"), lit(1000000000L).as("authq")))
    var prevRound: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      // Overflow-safe max-normalization: araw can be ~degree·10⁹, so
      // `araw * 10⁹` would overflow BIGINT on high-degree graphs (it
      // DID at sf0.1). Pre-scale both sides by s = ceil(amax / 10⁹)
      // first — then the numerator is ≤ 10¹⁸ and the max vertex still
      // lands exactly on 10⁹ ((amax div s)·10⁹ div (amax div s)).
      val authRaw = e
        .join(state.select(col("id").as("src"), col("hubq")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("hubq")).as("araw"))
      val amax = authRaw.agg(max(col("araw")).as("amax"))
        .withColumn("s", expr("1L + (amax - 1L) div 1000000000L"))
      val auth = authRaw.crossJoin(amax)
        .select(col("id"),
          expr("((araw div s) * 1000000000L) div (amax div s)").as("authq"))
      val hubRaw = eByDst
        .join(auth.select(col("id").as("dst"), col("authq").as("aq")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(sum(col("aq")).as("hraw"))
      val hmax = hubRaw.agg(max(col("hraw")).as("hmax"))
        .withColumn("t", expr("1L + (hmax - 1L) div 1000000000L"))
      val hub = hubRaw.crossJoin(hmax)
        .select(col("id"),
          expr("((hraw div t) * 1000000000L) div (hmax div t)").as("hubq"))
      state = ckpt(vertices
        .join(hub, Seq("id"), "left")
        .join(auth.select(col("id"), col("authq")), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("hubq"), lit(0L)).as("hubq"),
          coalesce(col("authq"), lit(0L)).as("authq")))
      prevRound.foreach(free)
      prevRound = Some(state)
    }
    e.unpersist()
    eByDst.unpersist()
    state
  }

  /** Jaccard index per vertex pair (reference
   * `flink-gelly/.../library/similarity/JaccardIndex.java:50-53`): for
   * every pair with at least one shared neighbor, the number of SHARED
   * neighbors and the number of DISTINCT neighbors (union size) — the
   * score is shared/union, emitted as the exact integer pair (the
   * reference's Result also carries the two counts) so the gate needs
   * no float trust.
   *
   * Scale: two-paths are generated by joining the adjacency list with
   * itself ON THE COMMON NEIGHBOR — Σ deg(z)² pairs, the same bound as
   * the reference's group-span approach. `maxMediatorDegree` excludes
   * super-hub vertices from MEDIATING pairs (they still appear as pair
   * endpoints): both the wedge stage and the OUTPUT of pair similarity
   * are Σ C(deg(z),2), quadratic in hub degree, and a corpus whose hub
   * degrees grow with size (the sf10 derived graph: 150 fixed buckets ×
   * 100× the users) makes the result itself unboundedly larger than
   * the input. Same convention as the dedup family's hot-shingle
   * docfreq cap: the cap is far above any real degree at gate scales
   * (binds only when hubs dominate), and the oracle applies the
   * identical cap. */
  def jaccardIndex(edges: DataFrame, maxMediatorDegree: Long = Long.MaxValue): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = undirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val mediators = deg.filter(col("deg") <= maxMediatorDegree)
      .select(col("id").as("z"))
    val n1 = undirected.select(col("src").as("z"), col("dst").as("a"))
      .join(mediators, Seq("z"))
    val n2 = undirected.select(col("src").as("z"), col("dst").as("b"))
    val shared = n1.join(n2, Seq("z")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
    val out = shared
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("shared"),
        (col("da") + col("db") - col("shared")).as("denom"))
      .localCheckpoint()
    undirected.unpersist()
    out
  }

  /** Adamic-Adar similarity (reference
   * `flink-gelly/.../library/similarity/AdamicAdar.java`): for each
   * vertex pair, Σ over common neighbors z of 1/ln(deg(z)) — rarer
   * shared neighbors count more. Each neighbor's weight is QUANTIZED
   * to the 1e-7 grid (`floor(10⁷ / ln(deg))` as BIGINT) before the
   * sum, so the pairwise stage is exact integer arithmetic and two
   * engines hash-match (the same determinism trick as the
   * embedding-cosine family). deg(z) ≥ 2 for every common neighbor by
   * construction, so ln never hits zero. */
  def adamicAdar(edges: DataFrame, maxMediatorDegree: Long = Long.MaxValue): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val weighted = undirected
      .groupBy(col("src").as("z")).agg(count(lit(1)).as("deg"))
      // deg-1 vertices can never be a COMMON neighbor, and ln(1) = 0
      // would divide by zero — drop them before the weight compute.
      // The mediator-degree cap bounds wedge AND output volume on
      // hub-dominated graphs — see jaccardIndex's scaladoc; a capped
      // hub contributes ~0 score anyway (1/ln(deg) → 0 as deg grows).
      .filter(col("deg") >= 2 && col("deg") <= maxMediatorDegree)
      .select(col("z"), floor(lit(10000000L) / log(col("deg"))).cast("bigint").as("wq"))
    // weight join BEFORE the wedge self-join: the cap must prune
    // super-hub mediators ahead of the quadratic pair stage
    val n1 = undirected.select(col("src").as("z"), col("dst").as("a"))
      .join(weighted, Seq("z"))
    val n2 = undirected.select(col("src").as("z"), col("dst").as("b"))
    val out = n1.join(n2, Seq("z")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("wq")).as("score_q"))
      .localCheckpoint()
    undirected.unpersist()
    out
  }

  /** Local clustering coefficient inputs per vertex (reference
   * `flink-gelly/.../library/clustering/undirected/LocalClusteringCoefficient.java:58`):
   * degree, incident-triangle count, and neighbor-pair count
   * C(deg, 2) — the score is tri/pairs; emitting the EXACT integer
   * pair (as the reference's Result carries degree + triangle count)
   * keeps the gate float-free. Vertices with degree ≥ 1 only (the
   * reference's default `includeZeroDegreeVertices = false`). */
  def localClustering(edges: DataFrame): DataFrame = {
    val ed = edges
      .select(least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = ed.select(col("lo").as("id")).unionAll(ed.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val tri = triangles(ed.select(col("lo").as("src"), col("hi").as("dst")))
    val triPerVertex = tri.select(col("a").as("id"))
      .unionAll(tri.select(col("b").as("id")))
      .unionAll(tri.select(col("c").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    val out = deg.join(triPerVertex, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("degree * (degree - 1) div 2").as("n_pairs"))
      .localCheckpoint()
    ed.unpersist()
    out
  }

  /** Global clustering coefficient inputs (reference
   * `.../clustering/undirected/GlobalClusteringCoefficient.java`): one
   * row of (triplet count W = Σ C(d,2), triangle count T); the score
   * is 3T/W. Exact integers. */
  def globalClustering(edges: DataFrame): DataFrame = {
    val ed = edges
      .select(least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = ed.select(col("lo").as("id")).unionAll(ed.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val w = deg.agg(expr("sum(deg * (deg - 1)) div 2").as("n_triplets"))
    val t = triangles(ed.select(col("lo").as("src"), col("hi").as("dst")))
      .agg(count(lit(1)).as("n_triangles"))
    val out = w.crossJoin(t).localCheckpoint()
    ed.unpersist()
    out
  }

  /** Undirected triadic census (reference
   * `.../clustering/undirected/TriadicCensus.java:98-106`): counts of
   * triples by connectedness class — 30 (triangle) = T, 21 (open
   * wedge) = W − 3T, 12 (single edge) = m(n−2) − 2·c21 − 3·c30, and
   * 03 (empty) = C(n,3) − the rest. BIGINT arithmetic (the reference
   * emits BigInteger — at n ≳ 2M vertices the EMPTY-triad count
   * outgrows 64 bits; the connected classes stay in range far longer,
   * and they are what the analysis reads). */
  def triadCensus(edges: DataFrame): DataFrame = {
    val ed = edges
      .select(least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = ed.select(col("lo").as("id")).unionAll(ed.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val base = deg.agg(
      count(lit(1)).as("n"),
      expr("sum(deg) div 2").as("m"),
      expr("sum(deg * (deg - 1)) div 2").as("w"))
    val t = triangles(ed.select(col("lo").as("src"), col("hi").as("dst")))
      .agg(count(lit(1)).as("t"))
    val out = base.crossJoin(t)
      .select(
        expr("n * (n - 1) * (n - 2) div 6 - (m * (n - 2) - 2 * (w - 3 * t) - 3 * t) - (w - 3 * t) - t")
          .as("c03"),
        expr("m * (n - 2) - 2 * (w - 3 * t) - 3 * t").as("c12"),
        expr("w - 3 * t").as("c21"),
        col("t").as("c30"))
      .localCheckpoint()
    ed.unpersist()
    out
  }

  /** Undirected vertex/graph metrics (reference
   * `flink-gelly/.../library/metric/undirected/VertexMetrics.java`):
   * vertex count, edge count, triplet count Σ d(d−1)/2, and maximum
   * degree — one aggregation over the degree frame, one output row. */
  def vertexMetrics(edges: DataFrame): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = undirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    deg.agg(
      count(lit(1)).as("n_vertices"),
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum(deg * (deg - 1)) div 2").as("n_triplets"),
      max(col("deg")).as("max_degree"))
  }

  /** Edge metrics (reference Gelly
   * `library/metric/undirected/EdgeMetrics.java:91`): per vertex s,
   * `low` counts incident edges where s is the LOW-order endpoint
   * (d(s) < d(t), ties by id) — then triangle triplets per vertex =
   * C(low, 2) and rectangle triplets = C(low, 2) + low·(d − low),
   * summed and maxed over vertices. One degree self-join plus two
   * aggregates; all integers (C(low, 2) is exact — the numerator is
   * even and non-negative, so div has no floor/truncate divergence). */
  def edgeMetrics(edges: DataFrame): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = undirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val st = undirected
      .join(deg.select(col("id"), col("deg").as("ds")), col("src") === col("id")).drop("id")
      .join(deg.select(col("id"), col("deg").as("dt")), col("dst") === col("id")).drop("id")
    val stats = st
      .withColumn("is_low",
        (col("ds") < col("dt")) || (col("ds") === col("dt") && col("src") < col("dst")))
      .groupBy(col("src"))
      .agg(max(col("ds")).as("deg"),
        sum(when(col("is_low"), 1L).otherwise(0L)).as("low"))
    stats
      .select(expr("low * (low - 1) div 2").as("tt"),
        expr("low * (low - 1) div 2 + low * (deg - low)").as("rt"))
      .agg(sum(col("tt")).as("triangle_triplet_count"),
        sum(col("rt")).as("rectangle_triplet_count"),
        max(col("tt")).as("max_triangle_triplets"),
        max(col("rt")).as("max_rectangle_triplets"))
  }

  /** Average clustering coefficient (reference Gelly
   * `.../clustering/undirected/AverageClusteringCoefficient.java:47`):
   * mean of the per-vertex local scores, vertices with no neighbor
   * pair scoring 0. Scores live on a 1e-6 integer grid so the mean is
   * order-independent (a double sum would be partition-order noise). */
  def averageClustering(edges: DataFrame): DataFrame =
    localClustering(edges)
      .select(expr("""CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT)
                      ELSE (n_tri * CAST(1000000 AS BIGINT)) div n_pairs END""").as("cc_x1e6"))
      .agg(count(lit(1)).as("n_vertices"),
        expr("sum(cc_x1e6) div count(1)").as("avg_cc_x1e6"))

  /** Triangle enumeration (reference
   * `flink-gelly/.../library/TriangleEnumerator.java`): canonicalize
   * each edge to (lo < hi), build wedges a<b<c by joining edge lists on
   * the middle vertex, close each wedge against the third edge (a, c).
   * Output one row per triangle, vertex ids ascending.
   *
   * Scale: two equi-joins on vertex ids; the wedge join's blow-up is
   * Σ deg(b)² over middle vertices — the canonical a<b<c orientation
   * halves every degree, the reference's degree-based orientation is
   * the further refinement if hubs dominate. No all-pairs anywhere. */
  def triangles(edges: DataFrame): DataFrame = {
    val ed = edges
      .select(least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") < col("hi"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ab = ed.select(col("lo").as("a"), col("hi").as("b"))
    val bc = ed.select(col("lo").as("b"), col("hi").as("c"))
    val ac = ed.select(col("lo").as("a"), col("hi").as("c"))
    val out = ab.join(bc, Seq("b")).join(ac, Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
      .localCheckpoint()
    ed.unpersist()
    out
  }

  /** Graph summarization (reference
   * `flink-gelly/.../library/Summarization.java`): condense a graph by
   * a vertex attribute — every edge is rewritten to its endpoints'
   * group values and counted. `vertices` is (id, value), `edges` is
   * (src, dst). Output: (src_value, dst_value, n_edges).
   *
   * Scale: two equi-joins on vertex id + one aggregation — the same
   * shape at any size; no grouping ever materializes a vertex list. */
  def summarize(vertices: DataFrame, edges: DataFrame): DataFrame = {
    edges
      .join(vertices.select(col("id").as("src"), col("value").as("src_value")), Seq("src"))
      .join(vertices.select(col("id").as("dst"), col("value").as("dst_value")), Seq("dst"))
      .groupBy(col("src_value"), col("dst_value"))
      .agg(count(lit(1)).as("n_edges"))
  }

  /** Single-source BFS distances via DELTA iteration (the reference's
   * `DataSet.iterateDelta`, `DataSet.java:1181` / Gelly
   * scatter-gather): a SOLUTION SET of settled (id, dist) pairs and a
   * WORKSET of vertices improved last round — each round only the
   * workset propagates, and the loop exits early once the workset
   * empties. For unit weights a vertex's first-found distance is
   * final, so `maxRounds` delta rounds equal `maxRounds` bulk BFS
   * rounds — which is what the unrolled SQL oracle computes.
   *
   * Scale: per round one join of edges against the (shrinking)
   * workset + one anti-join into the solution set — the delta
   * optimization is exactly what makes 100-TB iteration affordable,
   * versus bulk loops that re-join the whole solution every round.
   * The `isEmpty` early-exit is a driver-side scalar check, standard
   * for iterative dataflow (the reference's convergence criterion). */
  def ssspDelta(edges: DataFrame, sourceId: Long, maxRounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var solution = Seq((sourceId, 0L)).toDF("id", "dist")
    var workset = solution
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      round += 1
      val candidates = undirected
        .join(workset.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("dist") + 1).as("nd"))
      val improved = candidates
        .join(solution, Seq("id"), "left")
        .where(col("dist").isNull || col("nd") < col("dist"))
        .select(col("id"), col("nd").as("dist"))
        .localCheckpoint() // materialize: reused as workset AND merged
      // last round's workset fed `candidates`, now materialized — free
      if (round > 1) free(workset)
      if (improved.isEmpty) { free(improved); done = true }
      else {
        val prevSolution = solution
        solution = ckpt(solution.join(improved, Seq("id"), "left_anti")
          .unionAll(improved))
        if (round > 1) free(prevSolution) // round 1's seed is a tiny local DF
        workset = improved
      }
    }
    // solution is already checkpoint-materialized per round; the last
    // workset was merged into it, so its blocks are dead too — free
    // both it and the cached edge blocks before returning
    if (round > 0) free(workset)
    undirected.unpersist()
    solution
  }
}
