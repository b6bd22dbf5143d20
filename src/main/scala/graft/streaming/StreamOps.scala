package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicLong

/**
 * Event row consumed by the stateful streaming operators (the events
 * table shape). `ts_us` is event time in epoch microseconds — a long is
 * totally ordered, encoder-cheap, and free of timezone traps inside
 * state.
 */
case class Ev(event_id: Long, user_id: Long, event_type: String, ts_us: Long, value: Double)

/**
 * Structured-Streaming entry points (SURVEY.md §2.9 / M2). The
 * reference is a stream processor first (`DataStream.java:128`,
 * `WatermarkStrategy.java:133`); here streams are Spark streaming
 * DataFrames: file source → event-time transforms → memory sink.
 *
 * Scale notes: the file source is the test harness stand-in for any
 * DSv2 streaming source (kafka etc. swap in with one line). All
 * operators below keep per-key bounded state in the state store
 * (RocksDB-backed on a real cluster) — nothing buffers unbounded data
 * on the driver.
 */
object StreamOps {

  private val ctr = new AtomicLong(0)
  def freshName(prefix: String): String = s"${prefix}_${ctr.incrementAndGet()}"

  /** A cloned session with fewer shuffle/state partitions: at test
   * scale every micro-batch pays per-partition state-store I/O, so 8
   * partitions cuts that 4× vs the batch-tuned 32. On a real cluster
   * the cluster default stays in force (this is a session-local knob,
   * not a code-path difference). */
  def tuned(spark: SparkSession, partitions: Int = 8): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    ss
  }

  /** Streaming read of a driver parquet table, mirroring Tables.load's
   * normalization (events.ts parquet TIMESTAMP(NANOS) long →
   * TIMESTAMP_NTZ at micros). */
  def readStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val batch = spark.read.parquet(s"$dir/$name.parquet")
    // the tables are single files; the file streaming source requires a
    // directory or a glob — the trailing-star glob matches exactly the
    // one file and makes the source use the parent dir as basePath
    val sdf = spark.readStream.schema(batch.schema).parquet(s"$dir/$name.parquet*")
    if (name == "events" && batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      sdf.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else sdf
  }

  /** Run a streaming frame through a memory sink until all available
   * input is consumed (Trigger.AvailableNow); returns the sink as a
   * batch DataFrame for downstream batch post-processing / ordering. */
  def runToBatch(spark: SparkSession, sdf: DataFrame, mode: String, prefix: String): DataFrame = {
    val name = freshName(prefix)
    val q = sdf.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** The events stream as a typed Dataset[Ev] (event time in micros). */
  def eventsTyped(spark: SparkSession, dir: String): Dataset[Ev] = {
    import spark.implicits._
    readStream(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      .as[Ev]
  }
}
