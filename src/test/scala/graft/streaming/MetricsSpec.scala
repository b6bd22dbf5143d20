package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Metrics recorder over StreamingQueryProgress (reference
 * flink-metrics counters: numRecordsIn, state size, watermark). */
class MetricsSpec extends SparkSuite {

  test("recorder accumulates input rows, state rows, and the watermark per query") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val rec = Metrics.attach(spark)
    try {
      val ms = MemoryStream[(Long, java.sql.Timestamp)]
      val agg = ms.toDS().toDF("k", "ts")
        .withWatermark("ts", "10 seconds")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      val q = agg.writeStream.format("memory").queryName("t_metrics")
        .outputMode("update").start()
      def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
      try {
        ms.addData((1L, t(10)), (2L, t(20)), (1L, t(30)))
        q.processAllAvailable()
        ms.addData((3L, t(40)))
        q.processAllAvailable()
        // listener delivery is async relative to processAllAvailable
        val deadline = System.nanoTime() + 10_000_000_000L
        def counters = rec.byName("t_metrics")
        while (counters.forall(_.numRecordsIn < 4) && System.nanoTime() < deadline)
          Thread.sleep(50)
        val c = counters.get
        assert(c.numRecordsIn == 4, s"got $c")
        assert(c.stateRows == 3, s"3 distinct keys in state: $c") // keys 1, 2, 3
        assert(c.batches >= 2)
        // the watermark advanced off epoch once batch 2 committed
        assert(c.currentInputWatermark.exists(_ > "1970-01-01T00:00:00"), s"got $c")
      } finally q.stop()
    } finally spark.streams.removeListener(rec)
  }
}
