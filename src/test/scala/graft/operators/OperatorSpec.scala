package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Batch custom-operator semantics: AsOfJoin tie rules, CUMULATE slice
 * assignment, MinHashLSH end-to-end, SimHash determinism. */
class OperatorSpec extends SparkSuite {

  test("zipWithUniqueId: unique sparse ids, count preserved; ordered index contiguous") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(0, 1000).toDF("v").repartition(7)
    val uid = DataSetUtils.zipWithUniqueId(df)
    val ids = uid.select("uid").collect().map(_.getLong(0))
    assert(ids.length == 1000 && ids.distinct.length == 1000)
    val zi = DataSetUtils.zipWithIndexOrdered(df, col("v"))
    val idx = zi.orderBy(col("idx")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(idx.map(_._1).toSeq == (0L until 1000L)) // contiguous 0..n-1
    assert(idx.map(_._2).toSeq == (0L until 1000L)) // follows the order column
  }

  test("AsOfJoin: most recent right row at-or-before left time; ties keep the largest tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 20L, 105L), (3L, 30L, 95L))
      .toDF("id", "k_l", "t_l").withColumnRenamed("k_l", "k").withColumnRenamed("t_l", "t")
    val right = Seq(
      (10L, 100L, 1L, "a"),  // exactly at left#1's time → visible (inclusive)
      (10L, 100L, 2L, "b"),  // same ts, larger tiebreak → wins
      (10L, 90L, 3L, "c"),
      (20L, 110L, 4L, "d"),  // after left#2's time → invisible
      (30L, 80L, 5L, "e"))
      .toDF("rk", "rt", "seq", "payload")
    val out = AsOfJoin(left, right, "k", "rk", "t", "rt",
        rightCols = Seq("seq", "payload"), rightTieBreak = "seq")
      .orderBy("id")
      .select("id", "payload").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "b"), (2L, null), (3L, "e")))
  }

  test("CumulateWindow: each row lands in size/step expanding windows that contain it") {
    import spark.implicits._
    val df = Seq("2024-01-01 00:05:00").toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
    val out = CumulateWindow(df, "ts", stepMinutes = 20, sizeMinutes = 60)
      .select(col("w_start").cast("string"), col("w_end").cast("string"))
      .as[(String, String)].collect().toSeq.sorted
    assert(out == Seq(
      ("2024-01-01 00:00:00", "2024-01-01 00:20:00"),
      ("2024-01-01 00:00:00", "2024-01-01 00:40:00"),
      ("2024-01-01 00:00:00", "2024-01-01 01:00:00")))
  }

  test("MinHashLSH: near-identical docs pair up, unrelated docs do not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (3L, "completely different text about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    val pairs = MinHashLSH(docs, "doc_id", "text", shingleN = 3, numHashes = 8,
        numBands = 4, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("SimHash: identical texts share a fingerprint in [0, 2^16); different texts differ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val fp = SimHash(docs, "doc_id", "text")
      .select("doc", "simhash").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("broadcast variable (withBroadcastSet analog): a collected side set reaches every task") {
    // reference DataSet API `mapper.withBroadcastSet(ds, "name")` +
    // `getRuntimeContext.getBroadcastVariable("name")`: in Spark the
    // side data is collected once on the driver and shipped via
    // sc.broadcast — tasks read it from the local block manager.
    import spark.implicits._
    val allow = spark.sparkContext.broadcast(
      Seq("a", "c").toDF("k").as[String].collect().toSet)
    val out = Seq("a", "b", "c", "d").toDF("k").as[String]
      .mapPartitions(it => it.filter(allow.value))
      .collect().sorted.toSeq
    assert(out == Seq("a", "c"))
  }

  test("distributed cache (registerCachedFile analog): addFile ships a file readable in tasks") {
    // reference `env.registerCachedFile(path, "name")` +
    // `getRuntimeContext.getDistributedCache.getFile("name")`: Spark's
    // sc.addFile distributes the file; tasks resolve a LOCAL copy via
    // SparkFiles.get (never re-reading the driver path).
    val f = java.nio.file.Files.createTempFile("graft_cache", ".txt")
    java.nio.file.Files.writeString(f, "a=1\nb=2\n")
    spark.sparkContext.addFile(f.toString)
    val fname = f.getFileName.toString
    val out = spark.range(0, 4).rdd.mapPartitions { it =>
      val path = org.apache.spark.SparkFiles.get(fname)
      val m = scala.io.Source.fromFile(path).getLines()
        .map { l => val Array(k, v) = l.split("="); k -> v.toLong }.toMap
      it.map(i => m("a") + m("b") + i)
    }.collect().sorted
    assert(out.toSeq == Seq(3L, 4L, 5L, 6L))
  }

  test("accumulators (RuntimeContext#addAccumulator analog): task-side counts reach the driver") {
    // reference DataSet accumulators (IntCounter etc., collected into
    // the JobExecutionResult): Spark's AccumulatorV2 registered on the
    // context, incremented in tasks, read on the driver after the
    // action — same merge-on-completion semantics.
    val rejected = spark.sparkContext.longAccumulator("rejected")
    val kept = spark.range(0, 100).rdd.mapPartitions { it =>
      it.filter { i => val ok = i % 3 == 0; if (!ok) rejected.add(1); ok }
    }.count()
    assert(kept == 34)
    assert(rejected.value == 66)
  }

  test("semantic dedup: one keeper per duplicate group, groups stay within their cell") {
    import spark.implicits._
    val out = graft.queries.SimilarityQueries
      .queries("dedup_semantic")(spark, "/root/testdata/sf0.001")
      .select("vec_id", "cell", "grp", "keep")
      .as[(Long, Long, Long, Int)].collect()
    val byGrp = out.groupBy(_._3)
    // exactly one keeper per group (SemDeDup retains one representative)
    assert(byGrp.values.forall(_.count(_._4 == 1) == 1))
    // edges are mined within learned cells, so a group never spans cells
    assert(byGrp.values.forall(g => g.map(_._2).distinct.size == 1))
    // the group id is a member's vec_id (min-label propagation fixpoint)
    assert(byGrp.forall { case (g, ms) => ms.exists(_._1 == g) })
  }

  test("BPE merge: replace on the padded form is left-to-right non-overlapping (chain rule)") {
    // the rule text_bpe_merge_round documents: in a chain run the
    // shared delimiter is consumed, so alternate pairs merge — this
    // pins Spark's replace() to the DuckDB semantics the oracle uses
    // (measured: ' aa a a ' / ' aa a ')
    val got = spark.sql(
      "SELECT replace(' a a a a ', ' a a ', ' aa ') AS r1, " +
      "       replace(' a a a ',  ' a a ', ' aa ') AS r2").collect().head
    assert(got.getString(0) == " aa a a " && got.getString(1) == " aa a ",
      s"replace chain semantics drifted: $got")
  }

  test("BPE merge round: the chosen pair vanishes and max frequency never rises") {
    import spark.implicits._
    val rows = graft.queries.TextQueries
      .queries("text_bpe_merge_round")(spark, "/root/testdata/sf0.001")
      .select("merge_a", "merge_b", "a", "b", "cnt")
      .as[(String, String, String, String, Long)].collect()
    val (ma, mb) = (rows.head._1, rows.head._2)
    // after merging (ma, mb) everywhere, that adjacent pair is gone
    // from the top-10 (it can only survive via chain-run leftovers,
    // which the top-10 of this corpus doesn't reach)
    assert(!rows.exists(r => r._3 == ma && r._4 == mb),
      s"merged pair ($ma,$mb) still in the post-merge top pairs")
    // and merging can only LOWER the max pair frequency (a new pair
    // (x, ab) occurs at most as often as (x, a) did pre-merge)
    val preTop = graft.queries.TextQueries
      .queries("text_bpe_pair_counts")(spark, "/root/testdata/sf0.001")
      .select("cnt").as[Long].collect().max
    assert(rows.map(_._5).max <= preTop,
      s"post-merge top count ${rows.map(_._5).max} exceeds pre-merge top $preTop")
  }

  test("k-means iterate: assignments cover every point and round 2 moves some but not all") {
    import spark.implicits._
    val rows = graft.queries.SimilarityQueries
      .queries("sim_kmeans_iterate")(spark, "/root/testdata/sf0.001")
      .select("n_members", "n_moved").as[(Long, Long)].collect()
    val pts = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 8).count()
    assert(rows.map(_._1).sum == pts, "every point assigned exactly once")
    assert(rows.forall { case (n, m) => m >= 0 && m <= n })
  }
}
