package graft.graph

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the `spark.graft.graph.partitionEdges` contract (r15 guide
 * §2.4): with the flag on, loop-persisted edge frames are
 * hash-partitioned on the per-round join key — the round joins reuse
 * that partitioning instead of re-shuffling the edge side — and every
 * algorithm's OUTPUT is identical to the default path. */
class PregelPartitionSpec extends SparkSuite {

  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (1L, 7L), (8L, 1L))
    .toDF("src", "dst")
  private def vertices = (1L to 8L).toDF("id")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("partitionEdges=true leaves every loop algorithm's output identical") {
    val base = (
      canon(Pregel.minLabelPropagation(vertices, edges, rounds = 4)),
      canon(Pregel.pageRankFixed(vertices, edges, iters = 3)),
      canon(Pregel.hitsFixed(edges, rounds = 2)),
      canon(Pregel.labelPropagationMostFrequent(vertices, edges, rounds = 2)),
      canon(Pregel.communityDetection(vertices, edges, rounds = 2)))
    val part = withSQLConf("spark.graft.graph.partitionEdges" -> "true") {
      (
        canon(Pregel.minLabelPropagation(vertices, edges, rounds = 4)),
        canon(Pregel.pageRankFixed(vertices, edges, iters = 3)),
        canon(Pregel.hitsFixed(edges, rounds = 2)),
        canon(Pregel.labelPropagationMostFrequent(vertices, edges, rounds = 2)),
        canon(Pregel.communityDetection(vertices, edges, rounds = 2)))
    }
    assert(base == part)
  }

  test("with the flag on the persisted edge frame is hash-partitioned on src") {
    withSQLConf("spark.graft.graph.partitionEdges" -> "true",
        // force the non-broadcast regime a large cluster would see, so
        // the assertion exercises the join path the flag exists for
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val und = edges.select(col("src"), col("dst"))
        .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .repartition(col("src"))
        .persist()
      try {
        und.count()
        // one round's message join, as pregel() builds it
        val state = vertices.select(col("id"), col("id").as("state"))
        val msgs = und
          .join(state.select(col("id").as("src"), col("state").as("src_state")), Seq("src"))
        val out = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(out)) { msgs.explain("formatted") }
        val plan = out.toString
        // the persisted frame satisfies the join's required distribution:
        // only the (small) state side may be exchanged — no exchange may
        // sit between the InMemoryTableScan and the join
        val scanIdx = plan.indexOf("InMemoryTableScan")
        assert(scanIdx >= 0, s"expected cached edge scan:\n$plan")
        val joinIdx = plan.indexOf("SortMergeJoin") max plan.indexOf("ShuffledHashJoin")
        assert(joinIdx >= 0, s"expected a shuffled join under no-broadcast:\n$plan")
        // formatted explain lists children in operator-id order; assert
        // the cached scan is NOT fed through an Exchange by checking the
        // tree section: the line pattern "Exchange ... InMemoryTableScan"
        // must not appear as parent/child
        val tree = plan.take(plan.indexOf("(1) "))
        val lines = tree.linesIterator.toSeq
        val badFeed = lines.sliding(2).exists { w =>
          w.length == 2 && w(1).contains("InMemoryTableScan") &&
            (w(0).contains("Exchange") || w(0).contains("Sort ")) &&
            w(0).contains("Exchange")
        }
        assert(!badFeed, s"cached edge frame re-exchanged:\n$plan")
      } finally und.unpersist()
    }
  }
}
