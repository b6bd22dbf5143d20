package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bipartite graph projections (reference Gelly
 * `flink-gelly/.../bipartite/BipartiteGraph.java:56`): a graph whose
 * edges connect a TOP vertex set to a BOTTOM vertex set (users–items,
 * suppliers–parts), projected onto one side — two top vertices become
 * adjacent iff some bottom vertex connects to both.
 *
 * The SIMPLE projection (`projectionTopSimple`, BipartiteGraph.java:130)
 * is one self-join of the edge set on the bottom key: every ORDERED
 * pair of distinct top vertices sharing a bottom vertex yields an edge
 * carrying both original edge values — one edge PER shared bottom
 * vertex (multi-edges preserved), exactly the reference's
 * FlatJoinFunction output.
 *
 * Scale: an equi-join on the bottom key; output is Σ_b d(b)·(d(b)−1),
 * so a HOT bottom vertex (an item everyone buys) dominates
 * quadratically. At 100 TB, cap or pre-filter hot bottoms before
 * projecting — the same document-frequency-cap lever the n-gram
 * dedup applies (`queries/DedupQueries.scala` hot-shingle cap); the
 * projection itself stays a plain shuffle-hash/sort-merge join.
 */
object Bipartite {

  /** Simple projection onto the top vertex set. Output columns:
   * (top_src, top_dst, bottom, ev_src, ev_dst). The bottom projection
   * is the same call with top/bottom columns swapped
   * (BipartiteGraph.java:182 is symmetric). */
  def projectionTopSimple(edges: DataFrame, topCol: String,
      bottomCol: String, evCol: String): DataFrame = {
    val l = edges.select(col(topCol).as("top_src"), col(bottomCol).as("__bl"),
      col(evCol).as("ev_src"))
    val r = edges.select(col(topCol).as("top_dst"), col(bottomCol).as("__br"),
      col(evCol).as("ev_dst"))
    l.join(r, col("__bl") === col("__br") && col("top_src") =!= col("top_dst"))
      .select(col("top_src"), col("top_dst"), col("__bl").as("bottom"),
        col("ev_src"), col("ev_dst"))
  }
}
