package graft.graph

import org.apache.spark.sql.DataFrame
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
 * update); intermediate frames are persisted and lineage is cut with
 * localCheckpoint every few rounds so plans don't grow unboundedly —
 * the standard iterative-DataFrame discipline at cluster scale.
 */
object Pregel {

  /** Min-label propagation for `rounds` FIXED rounds over an undirected
   * edge list (src, dst): label := min(label, neighbors' labels).
   * With rounds >= graph diameter this is connected components
   * (labels = min vertex id in the component). Fixed rounds keep the
   * result exactly reproducible by the SQL oracle. */
  def minLabelPropagation(vertices: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    // undirected: send messages both ways
    val undirected = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col("id"), col("id").as("label"))
    for (round <- 1 to rounds) {
      val msgs = undirected
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      labels = labels.join(msgs, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      if (round % 3 == 0) labels = labels.localCheckpoint() // cut lineage
    }
    // materialize the result (eager localCheckpoint), then release the
    // cached edge blocks — they otherwise leak across repeated runs in
    // one session (gate + bench share a JVM)
    val out = labels.localCheckpoint()
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
   *
   * Same plan shape as [[pageRank]] (two shuffles per round,
   * localCheckpoint lineage cuts). */
  def pageRankFixed(vertices: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val n = vertices.count()
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices.select(col("id"), lit(1000000000L / n).as("rankq"))
    for (i <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("rankq div deg")).as("recv"))
      ranks = vertices.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(150000000L / n) + expr("(85 * coalesce(recv, 0L)) div 100")).as("rankq"))
      if (i % 3 == 0) ranks = ranks.localCheckpoint()
    }
    val out = ranks.localCheckpoint() // materialize before freeing outDeg
    outDeg.unpersist()
    out
  }

  /** Standard PageRank, fixed iterations, damping 0.85. Kept exactly
   * deterministic per-engine run (pure joins/aggregations); cross-engine
   * float equality is NOT promised — validated by spec on a known
   * graph (the fixed-point variant above is the hash-gated one). */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val n = vertices.count().toDouble
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices.select(col("id"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("recv"))
      ranks = vertices.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("recv"), lit(0.0))).as("rank"))
      if (i % 3 == 0) ranks = ranks.localCheckpoint()
    }
    val out = ranks.localCheckpoint() // materialize before freeing outDeg
    outDeg.unpersist()
    out
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
      if (improved.isEmpty) done = true
      else {
        solution = solution.join(improved, Seq("id"), "left_anti")
          .unionAll(improved)
          .localCheckpoint()
        workset = improved
      }
    }
    // solution is already localCheckpoint-materialized per round; free
    // the cached edge blocks before returning
    undirected.unpersist()
    solution
  }
}
