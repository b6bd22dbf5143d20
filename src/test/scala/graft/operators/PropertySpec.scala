package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * ScalaCheck-generated randomized properties (SURVEY §5): the Spark
 * formulations of keep-first dedup and AsOfJoin agree with
 * straightforward in-memory reference implementations. Generators are
 * sampled with fixed seeds (deterministic CI) — each evaluation runs a
 * real Spark job, so cases are few and small.
 */
class PropertySpec extends SparkSuite {

  private val rowGen: Gen[(Long, Long, Long)] = for {
    key <- Gen.choose(0L, 4L)
    ord <- Gen.choose(0L, 20L)
    id <- Gen.choose(0L, 1000L)
  } yield (key, ord, id)

  private def sample(seed: Long): List[(Long, Long, Long)] =
    Gen.nonEmptyListOf(rowGen)
      .apply(Gen.Parameters.default.withSize(25), Seed(seed))
      .getOrElse(List((0L, 0L, 0L)))

  test("property: keep-first dedup (row_number rn=1) equals in-memory min per key") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val rows = sample(seed).distinct
      val df = rows.toDF("k", "ord", "id")
      val w = Window.partitionBy(col("k")).orderBy(col("ord"), col("id"))
      val got = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("k", "ord", "id").as[(Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).values.map(_.minBy(r => (r._2, r._3))).toSet
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("property: AsOfJoin equals in-memory 'latest right at-or-before left time'") {
    import spark.implicits._
    for (seed <- 10L to 14L) {
      val ls = sample(seed).distinct.zipWithIndex.map { case ((k, t, _), i) => (i.toLong, k, t) }
      val rs = sample(seed + 100).distinct
      val left = ls.toDF("id", "k", "t")
      val right = rs.toDF("rk", "rt", "seq")
      val got = AsOfJoin(left, right, "k", "rk", "t", "rt",
          rightCols = Seq("seq"), rightTieBreak = "seq")
        .select("id", "seq").as[(Long, Option[Long])].collect().toMap
      val want = ls.map { case (id, k, t) =>
        val cands = rs.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) None else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == want, s"seed=$seed left=$ls right=$rs")
    }
  }
}
