package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BandJoin (the scalable inequality-join decompositions): randomized
 * differentials against brute force, boundary/degenerate cases, and
 * the no-nested-loop plan property that is the operator's point. */
class BandJoinSpec extends SparkSuite {

  private def leftDf(vs: Seq[Double]) = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lk", "lv")
  }
  private def rightDf(vs: Seq[Double]) = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rk", "rv")
  }

  test("countGreater matches brute force over random data, several band widths") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 4) {
      val ls = Seq.fill(60)(rnd.nextDouble() * 200 - 100)
      val rs = Seq.fill(150)(rnd.nextDouble() * 220 - 110)
      val bands = Seq(2, 7, 64)(trial % 3)
      val got = BandJoin.countGreater(
          leftDf(ls), "lk", "lv", rightDf(rs), "rv", "n", bands)
        .select(col("lk"), col("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = ls.zipWithIndex.map { case (v, i) =>
        i.toLong -> rs.count(_ > v).toLong }.toMap
      assert(got == exp, s"trial $trial bands=$bands")
    }
  }

  test("countGreater boundaries: duplicates at bucket edges, all-equal, empty-ish right") {
    // values identical on both sides: nothing is strictly greater
    val eq = BandJoin.countGreater(
        leftDf(Seq(5.0, 5.0)), "lk", "lv", rightDf(Seq(5.0, 5.0, 5.0)), "rv", "n", 8)
      .select(col("n")).collect().map(_.getLong(0)).toSeq
    assert(eq == Seq(0L, 0L))
    // single right value above everything lands in every count
    val one = BandJoin.countGreater(
        leftDf(Seq(1.0, 2.0, 3.0)), "lk", "lv", rightDf(Seq(10.0)), "rv", "n", 4)
      .select(col("lk"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    // truly EMPTY right side: every count is zero (min/max aggregate
    // returns NULL — must short-circuit, not NPE)
    val emptyR = BandJoin.countGreater(
        leftDf(Seq(1.0, 2.0)), "lk", "lv", rightDf(Seq.empty), "rv", "n", 4)
      .select(col("lk"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(emptyR == Map(0L -> 0L, 1L -> 0L))
    // all-NULL right values behave like empty
    val nullR = BandJoin.countGreater(
        leftDf(Seq(1.0)), "lk", "lv",
        rightDf(Seq(9.0)).withColumn("rv", lit(null).cast("double")),
        "rv", "n", 4)
      .select(col("n")).collect().map(_.getLong(0)).toSeq
    assert(nullR == Seq(0L))
    // empty LEFT side: empty result, count column present
    val emptyL = BandJoin.countGreater(
        leftDf(Seq.empty), "lk", "lv", rightDf(Seq(1.0, 2.0)), "rv", "n", 4)
    assert(emptyL.columns.contains("n") && emptyL.count() == 0)
  }

  test("absBand matches brute force and never plans a nested-loop join") {
    val rnd = new scala.util.Random(7L)
    val ls = Seq.fill(50)(rnd.nextDouble() * 40)
    val rs = Seq.fill(80)(rnd.nextDouble() * 40)
    val eps = 1.5
    val joined = BandJoin.absBand(leftDf(ls), "lv", rightDf(rs), "rv", eps)
    val got = joined.select(col("lk"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = (for {
      (l, i) <- ls.zipWithIndex
      (r, j) <- rs.zipWithIndex
      if math.abs(l - r) <= eps
    } yield (i.toLong, j.toLong)).toSet
    assert(got == exp)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"band join fell to all-pairs:\n$plan")
  }

  test("countGreater gate twin plans without a nested-loop join") {
    val df = graft.queries.JoinQueries.queries("join_theta_banded")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"banded theta fell to all-pairs:\n$plan")
  }
}
