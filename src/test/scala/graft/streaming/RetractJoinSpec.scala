package graft.streaming

import graft.SparkSuite
import graft.changelog.ChangelogOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Retraction-aware streaming join: -U/+U emission order across
 * batches and normalization to the final join image. */
class RetractJoinSpec extends SparkSuite {

  private def left(key: Long, t: Long, seq: Long, v: Double) =
    RjInput(isLeft = true, key, t, seq, v)
  private def right(key: Long, v: Double) =
    RjInput(isLeft = false, key, 0, 0, v)

  test("updates on either side retract the old image and assert the new one") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[RjInput]
    val q = RetractJoin.run(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_rj").outputMode("append").start()
    try {
      ms.addData(right(5, 1.0), left(5, 10, 1, 100.0))
      q.processAllAvailable()
      ms.addData(left(5, 20, 2, 200.0)) // left upsert → -U then +U
      q.processAllAvailable()
      ms.addData(right(5, 9.0))         // right upsert → -U then +U
      q.processAllAvailable()
      ms.addData(left(7, 30, 3, 300.0)) // no right side → nothing
      q.processAllAvailable()
      val got = spark.table("t_rj").as[RjChange].collect().sortBy(_.out_seq)
      assert(got.map(_.row_kind).toList == List("+I", "-U", "+U", "-U", "+U"))
      assert(got.map(c => (c.row_kind, c.left_seq.get, c.right_payload.get)).toList == List(
        ("+I", 1L, 1.0), ("-U", 1L, 1.0), ("+U", 2L, 1.0),
        ("-U", 2L, 1.0), ("+U", 2L, 9.0)))
      // normalize collapses the changelog to the final join image
      val img = ChangelogOps.normalize(spark.table("t_rj"), Seq("key"), "out_seq")
        .select("key", "left_seq", "right_payload")
        .as[(Long, Option[Long], Option[Double])].collect().toList
      assert(img == List((5L, Some(2L), Some(9.0))))
    } finally q.stop()
  }
}
