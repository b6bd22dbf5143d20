package graft.queries

import graft.{QueryPack, Tables}
import graft.graph.Pregel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Graph loops (SURVEY §7.1 `graph/`, reference Gelly
 * `Graph.java:1901-2003` + DataSet bulk iteration `DataSet.java:1181`)
 * over the bipartite user–event_type graph of the events table: type
 * vertices get negative ids from a deterministic dense rank, so both
 * engines label the identical graph. Fixed-round min-label propagation
 * is exactly reproducible by the SQL oracle (4 unrolled rounds);
 * PageRank runs in integer fixed-point (scale 10⁹, floored BIGINT
 * division per step) so the oracle's 5 unrolled rounds reproduce the
 * exact longs — both graph rows are full hash gates.
 */
object GraphQueries extends QueryPack {

  private def bipartite(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.load(s, dir, "events")
    val tmap = ev.select(col("event_type")).distinct()
      .withColumn("tid", -dense_rank().over(Window.orderBy(col("event_type"))).cast("long"))
    val edges = ev.select(col("user_id"), col("event_type")).distinct()
      .join(tmap, Seq("event_type"))
      .select(col("user_id").as("src"), col("tid").as("dst"))
    val vertices = ev.select(col("user_id").as("id")).distinct()
      .unionAll(tmap.select(col("tid").as("id")))
    (vertices, edges)
  }

  /** Canonical (lo < hi) undirected edge list of the derived general
   * graph shared by the triangle / similarity / metric gates: user →
   * floor(value·100) % 150 on every 20th event. */
  private def generalEdges(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    ev.filter(col("event_id") % 20 === 0)
      .select(col("user_id").as("s"),
        (floor(col("value") * 100).cast("bigint") % 150).as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("src"), greatest(col("s"), col("d")).as("dst"))
      .distinct()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Connected-component labels after 4 fixed propagation rounds.
    "graph_cc_labels" -> ((s, dir) => {
      val (v, e) = bipartite(s, dir)
      Pregel.minLabelPropagation(v, e, rounds = 4)
        .filter(col("id") >= 0)
        .orderBy(col("id"))
    }),

    // PageRank over the user→type→user structure in integer
    // fixed-point (scale 10⁹, floored BIGINT division per step) so the
    // DuckDB oracle reproduces the exact longs — full hash gate.
    "graph_pagerank" -> ((s, dir) => {
      val (v, e) = bipartite(s, dir)
      val undirected = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      Pregel.pageRankFixed(v, undirected, iters = 5)
        .orderBy(col("rankq").desc, col("id"))
        .limit(20)
    }),

    // Triangle enumeration (reference Gelly TriangleEnumerator) over a
    // deterministic general graph derived from events (the bipartite
    // user–type graph is triangle-free): user → floor(value*100) % 150,
    // every 20th event. 45 canonical (a < b < c) triangles at sf0.01.
    "graph_triangles" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val edges = ev.filter(col("event_id") % 20 === 0)
        .select(col("user_id").as("src"),
          (floor(col("value") * 100).cast("bigint") % 150).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      Pregel.triangles(edges).orderBy(col("a"), col("b"), col("c"))
    }),

    // Graph summarization (reference Gelly Summarization): condense
    // the triangle-gate graph by each user's dominant event type —
    // edges rewrite to (src group, dst group) with counts.
    "graph_summarize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type"))
      val vertices = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id").as("id"), col("event_type").as("value"))
      val raw = ev.filter(col("event_id") % 20 === 0)
        .select(col("user_id").as("s"),
          (floor(col("value") * 100).cast("bigint") % 150).as("d"))
        .filter(col("s") =!= col("d"))
        .distinct()
      val edges = raw.select(least(col("s"), col("d")).as("src"),
          greatest(col("s"), col("d")).as("dst")).distinct()
      Pregel.summarize(vertices, edges)
        .orderBy(col("src_value"), col("dst_value"))
    }),

    // Most-frequent-label community detection, 3 fixed rounds
    // (reference Gelly LabelPropagation: ties -> greater label) over
    // the canonical undirected derived graph.
    "graph_label_propagation" -> ((s, dir) => {
      val e = generalEdges(s, dir)
      val v = e.select(col("src").as("id"))
        .unionAll(e.select(col("dst").as("id"))).distinct()
      Pregel.labelPropagationMostFrequent(v, e, rounds = 3)
        .orderBy(col("id"))
    }),

    // Community detection with hop attenuation, 3 fixed rounds
    // (reference Gelly CommunityDetection, delta = 0.5): scored labels
    // in integer fixed-point at scale 1e6, exact across engines.
    "graph_community_detection" -> ((s, dir) => {
      val e = generalEdges(s, dir)
      val v = e.select(col("src").as("id"))
        .unionAll(e.select(col("dst").as("id"))).distinct()
      Pregel.communityDetection(v, e, rounds = 3)
        .orderBy(col("id"))
    }),

    // HITS hubs/authorities, 2 fixed rounds in integer fixed-point
    // (max-normalized per half-round — see Pregel.hitsFixed scaladoc
    // for the documented L2-vs-max divergence) over the DIRECTED
    // user -> bucket graph. Top 20 authorities, full hash gate.
    "graph_hits" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val e = ev.filter(col("event_id") % 20 === 0)
        .select(col("user_id").as("src"),
          (floor(col("value") * 100).cast("bigint") % 150).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      Pregel.hitsFixed(e, rounds = 2)
        .orderBy(col("authq").desc, col("hubq").desc, col("id"))
        .limit(20)
    }),

    // Jaccard index per vertex pair with >= 1 shared neighbor
    // (reference Gelly JaccardIndex): exact integer (shared, union)
    // counts, no float trust needed. Mediator-degree cap 1000: far
    // above any real degree through sf1 (max 62 at sf0.1), binds only
    // when fixed-bucket hubs accumulate 100× the users (sf10) — where
    // uncapped pair output is quadratic in hub degree. Oracle applies
    // the identical cap.
    "graph_jaccard_index" -> ((s, dir) => {
      Pregel.jaccardIndex(generalEdges(s, dir), maxMediatorDegree = 1000L)
        .orderBy(col("a"), col("b"))
    }),

    // Adamic-Adar similarity (reference Gelly AdamicAdar): per-pair
    // sum of 1/ln(deg) over common neighbors, each weight quantized to
    // the 1e-7 grid before the exact integer sum. Same mediator cap as
    // graph_jaccard_index (capped hubs contribute ~0 score by 1/ln).
    "graph_adamic_adar" -> ((s, dir) => {
      Pregel.adamicAdar(generalEdges(s, dir), maxMediatorDegree = 1000L)
        .orderBy(col("a"), col("b"))
    }),

    // Undirected graph metrics (reference Gelly VertexMetrics):
    // vertices, edges, triplets, max degree in one aggregate row.
    "graph_vertex_metrics" -> ((s, dir) => {
      Pregel.vertexMetrics(generalEdges(s, dir))
    }),

    // Edge metrics (reference Gelly metric/undirected/EdgeMetrics):
    // triangle/rectangle triplet counts and maxima from per-vertex
    // low-order incident-edge counts.
    "graph_edge_metrics" -> ((s, dir) => {
      Pregel.edgeMetrics(generalEdges(s, dir))
    }),

    // Average clustering coefficient (reference Gelly
    // AverageClusteringCoefficient): mean local score on the 1e-6
    // integer grid.
    "graph_avg_clustering" -> ((s, dir) => {
      Pregel.averageClustering(generalEdges(s, dir))
    }),

    // Local clustering coefficient (reference Gelly
    // LocalClusteringCoefficient): per-vertex exact (degree,
    // incident triangles, neighbor pairs) — score = n_tri / n_pairs.
    "graph_local_clustering" -> ((s, dir) => {
      Pregel.localClustering(generalEdges(s, dir)).orderBy(col("id"))
    }),

    // Global clustering coefficient inputs (reference Gelly
    // GlobalClusteringCoefficient): (triplets, triangles), score 3T/W.
    "graph_global_clustering" -> ((s, dir) => {
      Pregel.globalClustering(generalEdges(s, dir))
    }),

    // Undirected triadic census (reference Gelly TriadicCensus):
    // triple counts by class 03/12/21/30, closed-form from
    // (n, m, wedges, triangles).
    "graph_triad_census" -> ((s, dir) => {
      Pregel.triadCensus(generalEdges(s, dir))
    }),

    // Single-source BFS distances from the first type vertex (tid -1)
    // via DELTA iteration (reference DataSet.iterateDelta): solution
    // set + shrinking workset, early exit on convergence. Unit weights
    // make k delta rounds equal k bulk rounds — the oracle's 6
    // unrolled min-merge rounds. Full hash gate.
    "graph_sssp_delta" -> ((s, dir) => {
      val (_, e) = bipartite(s, dir)
      Pregel.ssspDelta(e, sourceId = -1L, maxRounds = 6)
        .orderBy(col("id"))
    }),

    // Bipartite SIMPLE projection (reference BipartiteGraph
    // .projectionTopSimple): suppliers–parts edges from lineitem
    // (every 100th part keeps the shared-bottom fan-in bounded — the
    // hot-bottom cap the Scaladoc prescribes at scale), projected onto
    // suppliers: one edge per ordered supplier pair PER shared part,
    // carrying both sides' lineitem counts as the edge values.
    "graph_bipartite_projection" -> ((s, dir) => {
      val edges = Tables.load(s, dir, "lineitem")
        .filter(col("l_partkey") % 100 === 0)
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(count(lit(1)).as("n"))
      graft.graph.Bipartite.projectionTopSimple(edges, "l_suppkey", "l_partkey", "n")
        .orderBy(col("top_src"), col("top_dst"), col("bottom"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "graph_bipartite_projection" -> """
      WITH e AS (
        SELECT l_suppkey, l_partkey, CAST(count(*) AS BIGINT) AS n
        FROM lineitem WHERE l_partkey % 100 = 0
        GROUP BY l_suppkey, l_partkey)
      SELECT a.l_suppkey AS top_src, b.l_suppkey AS top_dst,
             a.l_partkey AS bottom, a.n AS ev_src, b.n AS ev_dst
      FROM e a JOIN e b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
      ORDER BY top_src, top_dst, bottom""",
    "graph_cc_labels" -> """
      WITH types AS (SELECT DISTINCT event_type FROM events),
      tmap AS (SELECT event_type,
                      -CAST(dense_rank() OVER (ORDER BY event_type) AS BIGINT) AS tid
               FROM types),
      e0 AS MATERIALIZED (SELECT DISTINCT e.user_id AS src, t.tid AS dst
             FROM events e JOIN tmap t USING (event_type)),
      edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      v AS (SELECT DISTINCT user_id AS id FROM events
            UNION SELECT tid FROM tmap),
      l0 AS MATERIALIZED (SELECT id, id AS label FROM v),
      l1 AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(m.nl, l.label)) AS label
             FROM l0 l LEFT JOIN (SELECT e.dst AS id, min(x.label) AS nl
                                  FROM edges e JOIN l0 x ON e.src = x.id
                                  GROUP BY e.dst) m ON l.id = m.id),
      l2 AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(m.nl, l.label)) AS label
             FROM l1 l LEFT JOIN (SELECT e.dst AS id, min(x.label) AS nl
                                  FROM edges e JOIN l1 x ON e.src = x.id
                                  GROUP BY e.dst) m ON l.id = m.id),
      l3 AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(m.nl, l.label)) AS label
             FROM l2 l LEFT JOIN (SELECT e.dst AS id, min(x.label) AS nl
                                  FROM edges e JOIN l2 x ON e.src = x.id
                                  GROUP BY e.dst) m ON l.id = m.id),
      l4 AS (SELECT l.id, least(l.label, coalesce(m.nl, l.label)) AS label
             FROM l3 l LEFT JOIN (SELECT e.dst AS id, min(x.label) AS nl
                                  FROM edges e JOIN l3 x ON e.src = x.id
                                  GROUP BY e.dst) m ON l.id = m.id)
      SELECT id, label FROM l4 WHERE id >= 0 ORDER BY id""",
    "graph_pagerank" -> """
      WITH types AS (SELECT DISTINCT event_type FROM events),
      tmap AS (SELECT event_type,
                      -CAST(dense_rank() OVER (ORDER BY event_type) AS BIGINT) AS tid
               FROM types),
      e0 AS (SELECT DISTINCT e.user_id AS src, t.tid AS dst
             FROM events e JOIN tmap t USING (event_type)),
      edges AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
      v AS (SELECT DISTINCT user_id AS id FROM events
            UNION SELECT tid FROM tmap),
      p AS (SELECT count(*) AS n FROM v),
      deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
      r0 AS (SELECT id, CAST(1000000000 // (SELECT n FROM p) AS BIGINT) AS rankq FROM v),
      r1 AS (SELECT v.id, CAST(150000000 // (SELECT n FROM p)
                               + (85 * coalesce(m.recv, 0)) // 100 AS BIGINT) AS rankq
             FROM v LEFT JOIN (SELECT e.dst AS id, sum(x.rankq // d.deg) AS recv
                               FROM edges e JOIN r0 x ON e.src = x.id
                                            JOIN deg d ON e.src = d.id
                               GROUP BY e.dst) m ON v.id = m.id),
      r2 AS (SELECT v.id, CAST(150000000 // (SELECT n FROM p)
                               + (85 * coalesce(m.recv, 0)) // 100 AS BIGINT) AS rankq
             FROM v LEFT JOIN (SELECT e.dst AS id, sum(x.rankq // d.deg) AS recv
                               FROM edges e JOIN r1 x ON e.src = x.id
                                            JOIN deg d ON e.src = d.id
                               GROUP BY e.dst) m ON v.id = m.id),
      r3 AS (SELECT v.id, CAST(150000000 // (SELECT n FROM p)
                               + (85 * coalesce(m.recv, 0)) // 100 AS BIGINT) AS rankq
             FROM v LEFT JOIN (SELECT e.dst AS id, sum(x.rankq // d.deg) AS recv
                               FROM edges e JOIN r2 x ON e.src = x.id
                                            JOIN deg d ON e.src = d.id
                               GROUP BY e.dst) m ON v.id = m.id),
      r4 AS (SELECT v.id, CAST(150000000 // (SELECT n FROM p)
                               + (85 * coalesce(m.recv, 0)) // 100 AS BIGINT) AS rankq
             FROM v LEFT JOIN (SELECT e.dst AS id, sum(x.rankq // d.deg) AS recv
                               FROM edges e JOIN r3 x ON e.src = x.id
                                            JOIN deg d ON e.src = d.id
                               GROUP BY e.dst) m ON v.id = m.id),
      r5 AS (SELECT v.id, CAST(150000000 // (SELECT n FROM p)
                               + (85 * coalesce(m.recv, 0)) // 100 AS BIGINT) AS rankq
             FROM v LEFT JOIN (SELECT e.dst AS id, sum(x.rankq // d.deg) AS recv
                               FROM edges e JOIN r4 x ON e.src = x.id
                                            JOIN deg d ON e.src = d.id
                               GROUP BY e.dst) m ON v.id = m.id)
      SELECT id, rankq FROM r5 ORDER BY rankq DESC, id LIMIT 20""",
    "graph_summarize" -> """
      WITH vt AS (
        SELECT user_id, event_type AS grp FROM (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY count(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type)
        WHERE rn = 1),
      raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d)
      SELECT a.grp AS src_value, b.grp AS dst_value, count(*) AS n_edges
      FROM ed JOIN vt a ON ed.lo = a.user_id JOIN vt b ON ed.hi = b.user_id
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "graph_triangles" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      ab AS (SELECT lo AS a, hi AS b FROM ed),
      bc AS (SELECT lo AS b, hi AS c FROM ed),
      ac AS (SELECT lo AS a, hi AS c FROM ed)
      SELECT a, b, c FROM ab JOIN bc USING (b) JOIN ac USING (a, c)
      ORDER BY a, b, c""",
    "graph_label_propagation" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      edges AS (SELECT lo AS src, hi AS dst FROM ed
                UNION SELECT hi, lo FROM ed),
      v AS (SELECT DISTINCT src AS id FROM edges),
      l0 AS (SELECT id, id AS label FROM v),
      f1 AS (SELECT e.dst AS id, x.label, count(*) AS cnt
             FROM edges e JOIN l0 x ON e.src = x.id GROUP BY 1, 2),
      w1 AS (SELECT id, label, row_number() OVER (PARTITION BY id
               ORDER BY cnt DESC, label DESC) AS rn FROM f1),
      l1 AS (SELECT l.id, coalesce(w.label, l.label) AS label
             FROM l0 l LEFT JOIN (SELECT id, label FROM w1 WHERE rn = 1) w
             ON l.id = w.id),
      f2 AS (SELECT e.dst AS id, x.label, count(*) AS cnt
             FROM edges e JOIN l1 x ON e.src = x.id GROUP BY 1, 2),
      w2 AS (SELECT id, label, row_number() OVER (PARTITION BY id
               ORDER BY cnt DESC, label DESC) AS rn FROM f2),
      l2 AS (SELECT l.id, coalesce(w.label, l.label) AS label
             FROM l1 l LEFT JOIN (SELECT id, label FROM w2 WHERE rn = 1) w
             ON l.id = w.id),
      f3 AS (SELECT e.dst AS id, x.label, count(*) AS cnt
             FROM edges e JOIN l2 x ON e.src = x.id GROUP BY 1, 2),
      w3 AS (SELECT id, label, row_number() OVER (PARTITION BY id
               ORDER BY cnt DESC, label DESC) AS rn FROM f3),
      l3 AS (SELECT l.id, coalesce(w.label, l.label) AS label
             FROM l2 l LEFT JOIN (SELECT id, label FROM w3 WHERE rn = 1) w
             ON l.id = w.id)
      SELECT id, label FROM l3 ORDER BY id""",
    "graph_community_detection" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      edges AS (SELECT lo AS src, hi AS dst FROM ed
                UNION SELECT hi, lo FROM ed),
      v AS (SELECT DISTINCT src AS id FROM edges),
      s0 AS (SELECT id, id AS label, CAST(1000000 AS BIGINT) AS scoreq FROM v),
      p1 AS (SELECT e.dst AS id, x.label, CAST(sum(x.scoreq) AS BIGINT) AS total,
                    max(x.scoreq) AS best
             FROM edges e JOIN s0 x ON e.src = x.id GROUP BY 1, 2),
      w1 AS (SELECT id, label, best, row_number() OVER (PARTITION BY id
               ORDER BY total DESC, label) AS rn FROM p1),
      s1 AS (SELECT s.id, coalesce(w.label, s.label) AS label,
                    CAST(CASE WHEN w.id IS NULL THEN s.scoreq
                              WHEN w.label = s.label THEN w.best
                              ELSE w.best - 500000 END AS BIGINT) AS scoreq
             FROM s0 s LEFT JOIN (SELECT id, label, best FROM w1 WHERE rn = 1) w
             ON s.id = w.id),
      p2 AS (SELECT e.dst AS id, x.label, CAST(sum(x.scoreq) AS BIGINT) AS total,
                    max(x.scoreq) AS best
             FROM edges e JOIN s1 x ON e.src = x.id GROUP BY 1, 2),
      w2 AS (SELECT id, label, best, row_number() OVER (PARTITION BY id
               ORDER BY total DESC, label) AS rn FROM p2),
      s2 AS (SELECT s.id, coalesce(w.label, s.label) AS label,
                    CAST(CASE WHEN w.id IS NULL THEN s.scoreq
                              WHEN w.label = s.label THEN w.best
                              ELSE w.best - 250000 END AS BIGINT) AS scoreq
             FROM s1 s LEFT JOIN (SELECT id, label, best FROM w2 WHERE rn = 1) w
             ON s.id = w.id),
      p3 AS (SELECT e.dst AS id, x.label, CAST(sum(x.scoreq) AS BIGINT) AS total,
                    max(x.scoreq) AS best
             FROM edges e JOIN s2 x ON e.src = x.id GROUP BY 1, 2),
      w3 AS (SELECT id, label, best, row_number() OVER (PARTITION BY id
               ORDER BY total DESC, label) AS rn FROM p3),
      s3 AS (SELECT s.id, coalesce(w.label, s.label) AS label,
                    CAST(CASE WHEN w.id IS NULL THEN s.scoreq
                              WHEN w.label = s.label THEN w.best
                              ELSE w.best - 166666 END AS BIGINT) AS scoreq
             FROM s2 s LEFT JOIN (SELECT id, label, best FROM w3 WHERE rn = 1) w
             ON s.id = w.id)
      SELECT id, label, scoreq FROM s3 ORDER BY id""",
    "graph_hits" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS src, CAST(floor(value * 100) AS BIGINT) % 150 AS dst
        FROM events WHERE event_id % 20 = 0),
      e AS (SELECT src, dst FROM raw WHERE src <> dst),
      v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      s0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS hubq,
                        CAST(1000000000 AS BIGINT) AS authq FROM v),
      ar1 AS (SELECT e.dst AS id, CAST(sum(x.hubq) AS BIGINT) AS araw
              FROM e JOIN s0 x ON e.src = x.id GROUP BY 1),
      sc1 AS (SELECT max(araw) AS amax, 1 + (max(araw) - 1) // 1000000000 AS s FROM ar1),
      a1 AS (SELECT id, ((araw // s) * 1000000000) // (amax // s) AS authq
             FROM ar1, sc1),
      hr1 AS (SELECT e.src AS id, CAST(sum(a.authq) AS BIGINT) AS hraw
              FROM e JOIN a1 a ON e.dst = a.id GROUP BY 1),
      hc1 AS (SELECT max(hraw) AS hmax, 1 + (max(hraw) - 1) // 1000000000 AS t FROM hr1),
      h1 AS (SELECT id, ((hraw // t) * 1000000000) // (hmax // t) AS hubq
             FROM hr1, hc1),
      s1 AS (SELECT v.id, CAST(coalesce(h1.hubq, 0) AS BIGINT) AS hubq,
                          CAST(coalesce(a1.authq, 0) AS BIGINT) AS authq
             FROM v LEFT JOIN h1 ON v.id = h1.id LEFT JOIN a1 ON v.id = a1.id),
      ar2 AS (SELECT e.dst AS id, CAST(sum(x.hubq) AS BIGINT) AS araw
              FROM e JOIN s1 x ON e.src = x.id GROUP BY 1),
      sc2 AS (SELECT max(araw) AS amax, 1 + (max(araw) - 1) // 1000000000 AS s FROM ar2),
      a2 AS (SELECT id, ((araw // s) * 1000000000) // (amax // s) AS authq
             FROM ar2, sc2),
      hr2 AS (SELECT e.src AS id, CAST(sum(a.authq) AS BIGINT) AS hraw
              FROM e JOIN a2 a ON e.dst = a.id GROUP BY 1),
      hc2 AS (SELECT max(hraw) AS hmax, 1 + (max(hraw) - 1) // 1000000000 AS t FROM hr2),
      h2 AS (SELECT id, ((hraw // t) * 1000000000) // (hmax // t) AS hubq
             FROM hr2, hc2),
      s2 AS (SELECT v.id, CAST(coalesce(h2.hubq, 0) AS BIGINT) AS hubq,
                          CAST(coalesce(a2.authq, 0) AS BIGINT) AS authq
             FROM v LEFT JOIN h2 ON v.id = h2.id LEFT JOIN a2 ON v.id = a2.id)
      SELECT id, hubq, authq FROM s2
      ORDER BY authq DESC, hubq DESC, id LIMIT 20""",
    "graph_jaccard_index" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      edges AS (SELECT lo AS src, hi AS dst FROM ed
                UNION SELECT hi, lo FROM ed),
      deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY 1),
      medge AS (SELECT e.src, e.dst FROM edges e
                JOIN deg dm ON e.src = dm.id AND dm.deg <= 1000),
      shared AS (SELECT n1.dst AS a, n2.dst AS b, count(*) AS shared
                 FROM medge n1 JOIN edges n2
                   ON n1.src = n2.src AND n1.dst < n2.dst
                 GROUP BY 1, 2)
      SELECT a, b, shared, da.deg + db.deg - shared AS denom
      FROM shared JOIN deg da ON shared.a = da.id
                  JOIN deg db ON shared.b = db.id
      ORDER BY a, b""",
    "graph_adamic_adar" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      edges AS (SELECT lo AS src, hi AS dst FROM ed
                UNION SELECT hi, lo FROM ed),
      wq AS (SELECT src AS z, CAST(floor(10000000 / ln(count(*))) AS BIGINT) AS wq
             FROM edges GROUP BY src
             HAVING count(*) >= 2 AND count(*) <= 1000),
      tp AS (SELECT w.z, w.wq, n1.dst AS a, n2.dst AS b
             FROM wq w JOIN edges n1 ON n1.src = w.z
                       JOIN edges n2
               ON n1.src = n2.src AND n1.dst < n2.dst)
      SELECT a, b, CAST(sum(wq) AS BIGINT) AS score_q
      FROM tp
      GROUP BY 1, 2 ORDER BY a, b""",
    "graph_edge_metrics" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      edges AS (SELECT lo AS src, hi AS dst FROM ed
                UNION SELECT hi, lo FROM ed),
      deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
      st AS (SELECT e.src, e.dst, a.deg AS ds, b.deg AS dt
             FROM edges e JOIN deg a ON e.src = a.id JOIN deg b ON e.dst = b.id),
      stats AS (SELECT src, max(ds) AS deg,
                       CAST(sum(CASE WHEN ds < dt OR (ds = dt AND src < dst)
                                     THEN 1 ELSE 0 END) AS BIGINT) AS low
                FROM st GROUP BY src),
      tr AS (SELECT low * (low - 1) // 2 AS tt,
                    low * (low - 1) // 2 + low * (deg - low) AS rt
             FROM stats)
      SELECT CAST(sum(tt) AS BIGINT) AS triangle_triplet_count,
             CAST(sum(rt) AS BIGINT) AS rectangle_triplet_count,
             CAST(max(tt) AS BIGINT) AS max_triangle_triplets,
             CAST(max(rt) AS BIGINT) AS max_rectangle_triplets
      FROM tr""",
    "graph_avg_clustering" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      deg AS (SELECT id, count(*) AS degree FROM (
                SELECT lo AS id FROM ed UNION ALL SELECT hi FROM ed) GROUP BY id),
      ab AS (SELECT lo AS a, hi AS b FROM ed),
      bc AS (SELECT lo AS b, hi AS c FROM ed),
      ac AS (SELECT lo AS a, hi AS c FROM ed),
      tri AS (SELECT a, b, c FROM ab JOIN bc USING (b) JOIN ac USING (a, c)),
      tpv AS (SELECT id, count(*) AS n_tri FROM (
                SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri) GROUP BY id),
      cc AS (SELECT CASE WHEN degree * (degree - 1) // 2 = 0 THEN 0
                         ELSE CAST(coalesce(n_tri, 0) AS BIGINT) * 1000000
                              // (degree * (degree - 1) // 2) END AS cc_x1e6
             FROM deg LEFT JOIN tpv ON deg.id = tpv.id)
      SELECT CAST(count(*) AS BIGINT) AS n_vertices,
             CAST(sum(cc_x1e6) // count(*) AS BIGINT) AS avg_cc_x1e6
      FROM cc""",
    "graph_local_clustering" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      deg AS (SELECT id, count(*) AS degree FROM (
                SELECT lo AS id FROM ed UNION ALL SELECT hi FROM ed) GROUP BY id),
      ab AS (SELECT lo AS a, hi AS b FROM ed),
      bc AS (SELECT lo AS b, hi AS c FROM ed),
      ac AS (SELECT lo AS a, hi AS c FROM ed),
      tri AS (SELECT a, b, c FROM ab JOIN bc USING (b) JOIN ac USING (a, c)),
      tpv AS (SELECT id, count(*) AS n_tri FROM (
                SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri) GROUP BY id)
      SELECT deg.id, degree,
             CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
             degree * (degree - 1) // 2 AS n_pairs
      FROM deg LEFT JOIN tpv ON deg.id = tpv.id
      ORDER BY deg.id""",
    "graph_global_clustering" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      deg AS (SELECT id, count(*) AS deg FROM (
                SELECT lo AS id FROM ed UNION ALL SELECT hi FROM ed) GROUP BY id),
      ab AS (SELECT lo AS a, hi AS b FROM ed),
      bc AS (SELECT lo AS b, hi AS c FROM ed),
      ac AS (SELECT lo AS a, hi AS c FROM ed),
      tri AS (SELECT a, b, c FROM ab JOIN bc USING (b) JOIN ac USING (a, c))
      SELECT (SELECT CAST(sum(deg * (deg - 1)) AS BIGINT) // 2 FROM deg) AS n_triplets,
             (SELECT count(*) FROM tri) AS n_triangles""",
    "graph_triad_census" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      deg AS (SELECT id, count(*) AS deg FROM (
                SELECT lo AS id FROM ed UNION ALL SELECT hi FROM ed) GROUP BY id),
      ab AS (SELECT lo AS a, hi AS b FROM ed),
      bc AS (SELECT lo AS b, hi AS c FROM ed),
      ac AS (SELECT lo AS a, hi AS c FROM ed),
      base AS (SELECT count(*) AS n,
                      CAST(sum(deg) AS BIGINT) // 2 AS m,
                      CAST(sum(deg * (deg - 1)) AS BIGINT) // 2 AS w
               FROM deg),
      tc AS (SELECT count(*) AS t
             FROM (SELECT a, b, c FROM ab JOIN bc USING (b) JOIN ac USING (a, c)))
      SELECT n * (n - 1) * (n - 2) // 6
               - (m * (n - 2) - 2 * (w - 3 * t) - 3 * t)
               - (w - 3 * t) - t AS c03,
             m * (n - 2) - 2 * (w - 3 * t) - 3 * t AS c12,
             w - 3 * t AS c21,
             t AS c30
      FROM base, tc""",
    "graph_vertex_metrics" -> """
      WITH raw AS (
        SELECT DISTINCT user_id AS s, CAST(floor(value * 100) AS BIGINT) % 150 AS d
        FROM events WHERE event_id % 20 = 0),
      ed AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
             FROM raw WHERE s <> d),
      edges AS (SELECT lo AS src, hi AS dst FROM ed
                UNION SELECT hi, lo FROM ed),
      deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY 1)
      SELECT count(*) AS n_vertices,
             CAST(sum(deg) AS BIGINT) // 2 AS n_edges,
             CAST(sum(deg * (deg - 1)) AS BIGINT) // 2 AS n_triplets,
             max(deg) AS max_degree
      FROM deg""",
    "graph_sssp_delta" -> """
      WITH types AS (SELECT DISTINCT event_type FROM events),
      tmap AS (SELECT event_type,
                      -CAST(dense_rank() OVER (ORDER BY event_type) AS BIGINT) AS tid
               FROM types),
      e0 AS MATERIALIZED (SELECT DISTINCT e.user_id AS src, t.tid AS dst
             FROM events e JOIN tmap t USING (event_type)),
      edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      d0 AS MATERIALIZED (SELECT CAST(-1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist),
      d1 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
               SELECT id, dist FROM d0 UNION ALL
               SELECT e.dst, x.dist + 1 FROM edges e JOIN d0 x ON e.src = x.id
             ) GROUP BY id),
      d2 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
               SELECT id, dist FROM d1 UNION ALL
               SELECT e.dst, x.dist + 1 FROM edges e JOIN d1 x ON e.src = x.id
             ) GROUP BY id),
      d3 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
               SELECT id, dist FROM d2 UNION ALL
               SELECT e.dst, x.dist + 1 FROM edges e JOIN d2 x ON e.src = x.id
             ) GROUP BY id),
      d4 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
               SELECT id, dist FROM d3 UNION ALL
               SELECT e.dst, x.dist + 1 FROM edges e JOIN d3 x ON e.src = x.id
             ) GROUP BY id),
      d5 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
               SELECT id, dist FROM d4 UNION ALL
               SELECT e.dst, x.dist + 1 FROM edges e JOIN d4 x ON e.src = x.id
             ) GROUP BY id),
      d6 AS (SELECT id, min(dist) AS dist FROM (
               SELECT id, dist FROM d5 UNION ALL
               SELECT e.dst, x.dist + 1 FROM edges e JOIN d5 x ON e.src = x.id
             ) GROUP BY id)
      SELECT id, dist FROM d6 ORDER BY id"""
  )
}
