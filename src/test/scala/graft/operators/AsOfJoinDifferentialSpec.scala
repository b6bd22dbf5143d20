package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** Randomized differential for the batch [[AsOfJoin]]: random keyed
 * left/right tables with heavy timestamp ties must equal a scalar
 * backward-scan oracle (newest right row at-or-before the left time;
 * (t, tie) max wins ties; same-instant rights visible) — the reference
 * temporal/as-of contract checked here without a window-function
 * reformulation on the oracle side, so the union + last-over-window
 * trick is verified against independent logic, not against itself. */
class AsOfJoinDifferentialSpec extends SparkSuite {

  test("as-of join equals the scalar backward-scan oracle on random tied tables") {
    import spark.implicits._
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 12) {
      val nKeys = 1 + rnd.nextInt(4)
      val lefts = (1 to 10 + rnd.nextInt(30)).map(i =>
        (1L + rnd.nextInt(nKeys), (1 + rnd.nextInt(8)).toLong, i.toLong))
      val rights = (1 to 5 + rnd.nextInt(25)).map(i =>
        (1L + rnd.nextInt(nKeys), (1 + rnd.nextInt(8)).toLong, i.toLong, i * 7L))
      val l = lefts.toDF("k", "t", "id")
      val r = rights.toDF("rk", "rt", "tie", "payload")

      val got = AsOfJoin(l, r, "k", "rk", "t", "rt",
          Seq("payload"), "tie")
        .select(col("id"), col("payload"))
        .as[(Long, Option[Long])].collect().toMap

      val expected = lefts.map { case (k, t, id) =>
        id -> rights.filter(rr => rr._1 == k && rr._2 <= t)
          .sortBy(rr => (rr._2, rr._3)).lastOption.map(_._4)
      }.toMap

      assert(got == expected,
        s"case $case_ (seed $seed): as-of join diverged from the " +
        s"backward-scan oracle\n" +
        expected.keys.toSeq.sorted.filter(id => got.get(id) != Some(expected(id)))
          .take(5).map(id => s"  left $id: got=${got.get(id)} want=${expected(id)}")
          .mkString("\n"))
    }
  }

  test("salted skew join equals the plain equi-join on random skewed tables, any salt count") {
    import spark.implicits._
    val seed = 733L
    val rnd = new scala.util.Random(seed)
    for (case_ <- 0 until 8) {
      // zipf-ish skew: most probe rows hit one hot key
      val probe = (1 to 40 + rnd.nextInt(60)).map { i =>
        val k = if (rnd.nextInt(10) < 7) 1L else 1L + rnd.nextInt(5)
        (k, i.toLong)
      }.toDF("pk", "pid")
      val build = (1 to 3 + rnd.nextInt(8)).map(i =>
        (1L + rnd.nextInt(5), s"b$i")).toDF("bk", "bval")
      val salts = 1 + rnd.nextInt(8)
      def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, String)] =
        df.select(col("pk"), col("pid"), col("bk"), col("bval"))
          .as[(Long, Long, Long, String)].collect().toSeq.sorted
      val plain = canon(probe.join(build, col("pk") === col("bk")))
      val salted = canon(SkewJoin.saltedEquiJoin(probe, build, "pk", "bk", salts))
      assert(salted == plain,
        s"case $case_ (seed $seed): salted join (salts=$salts) diverged from " +
        s"the plain equi-join: ${salted.size} vs ${plain.size} rows")
    }
  }
}
