package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Savepoint rescaling — the reference's change-parallelism-on-restore
 * (`flink-runtime/.../checkpoint/StateAssignmentOperation.java:60`:
 * key groups are re-assigned across a DIFFERENT operator parallelism
 * when a job restarts from a savepoint; the user-facing workflow is
 * `flink stop --savepointPath` → redeploy with a new parallelism).
 *
 * Structured Streaming pins a stateful query's state-store partition
 * count to the shuffle-partition count of its FIRST micro-batch — a
 * native restart from the same checkpoint cannot change parallelism.
 * This module reproduces the savepoint workflow on top of two public
 * Spark surfaces instead:
 *
 *   1. the stopped query's checkpoint IS the savepoint: its keyed
 *      state is read out with the state data source
 *      (`spark.read.format("statestore")`, `stateVarName` for
 *      transformWithState operators) — the analog of the reference's
 *      savepoint reader (`flink-libraries/flink-state-processing-api/
 *      .../SavepointReader.java` readKeyedState);
 *   2. a FRESH query starts at the new parallelism with its state
 *      seeded through transformWithState's initial-state overload
 *      ([[BootstrapOps]]) — the initial frame hash-shuffles on the
 *      grouping key into the NEW partition layout, which is exactly
 *      the reference's key-group redistribution, done by the engine's
 *      ordinary exchange instead of a bespoke assigner.
 *
 * Scale: the savepoint read scans the state store once (parallel per
 * store partition); redistribution is ONE hash shuffle of |keys| state
 * rows. Nothing round-trips the driver, so a 1000-executor restore of
 * a billion-key store is the same plan, wider.
 */
object Rescale {

  /** GENERIC savepoint read — the reference's operator-generic
   * `SavepointReader.readKeyedState` analog: ANY transformWithState
   * operator's named state variable out of a stopped query's
   * checkpoint, as the raw (key, value, partition_id) frame. Every
   * per-operator reader below is a projection over this; new stateful
   * operators get savepoint/rescale support by writing only their
   * seed projection + an initial-state processor overload. */
  def savepointRead(spark: SparkSession, ckpt: String,
      stateVarName: String): org.apache.spark.sql.DataFrame =
    spark.read.format("statestore")
      .option("stateVarName", stateVarName)
      .load(ckpt)

  /** Savepoint read: the per-key running totals out of a STOPPED
   * totals query's checkpoint (state variable `totals` of
   * [[BootstrapOps.BootstrappedTotalsProcessor]]). The state source
   * exposes `partition_id` too — [[savepointTotalsWithPartition]]
   * keeps it for rescale verification; this projection is the seed
   * frame shape. */
  def savepointTotals(spark: SparkSession, ckpt: String): Dataset[BootTotal] = {
    import spark.implicits._
    savepointTotalsWithPartition(spark, ckpt)
      .select(col("user_id"), col("n"), col("cents")).as[BootTotal]
  }

  /** Savepoint read keeping the source store partition — the proof
   * surface that a later rescale actually MOVED keys across a
   * different partition count. */
  def savepointTotalsWithPartition(spark: SparkSession, ckpt: String) =
    savepointRead(spark, ckpt, "totals")
      .select(col("value.user_id").as("user_id"), col("value.n").as("n"),
        col("value.cents").as("cents"), col("partition_id"))

  /** Savepoint read for the keyed Top-N op ([[TwsOps.TopNProcessor]],
   * state variable `topn` — the key's current top-n buffer): seed
   * frame for [[resumeTopN]], through the generic reader. */
  def savepointTopN(spark: SparkSession, ckpt: String): Dataset[TopNBuf] = {
    import spark.implicits._
    savepointRead(spark, ckpt, "topn")
      .select(col("value.event_type").as("event_type"), col("value.rows").as("rows"))
      .as[TopNBuf]
  }

  /** Resume Top-N at the current session parallelism, seeded from a
   * savepoint frame read at the OLD parallelism. */
  def resumeTopN(stream: Dataset[Ev], savepoint: Dataset[TopNBuf],
      n: Int = 3): Dataset[Ev] =
    TwsOps.topNByTypeSeeded(stream, savepoint, n)

  /** Resume the totals fold at the CURRENT session parallelism, seeded
   * from a savepoint frame read at the OLD parallelism. The caller
   * picks the new scale by handing a session whose
   * `spark.sql.shuffle.partitions` differs from the stopped query's —
   * the seed shuffle and the new state store both follow it. */
  def resumeTotals(stream: Dataset[Ev], savepoint: Dataset[BootTotal]): Dataset[BootTotal] =
    BootstrapOps.totalsWithBootstrap(stream, savepoint)

  /** Savepoint read for the keep-last dedup op ([[TwsOps]], state
   * variable `winner` — a full Ev row per key): the same
   * checkpoint-is-the-savepoint workflow over a DIFFERENT state shape,
   * showing the pattern is generic across value-state operators. */
  def savepointKeepLast(spark: SparkSession, ckpt: String): Dataset[Ev] = {
    import spark.implicits._
    savepointRead(spark, ckpt, "winner")
      .select(col("value.event_id"), col("value.user_id"),
        col("value.event_type"), col("value.ts_us"), col("value.value"))
      .as[Ev]
  }

  /** Resume keep-last at the current session parallelism, seeded from
   * a savepoint frame; restored winners displace only on strictly
   * newer events, exactly as live ones. */
  def resumeKeepLast(stream: Dataset[Ev], savepoint: Dataset[Ev]): Dataset[Ev] =
    TwsOps.keepLastByUserSeeded(stream, savepoint)

  /** Queryable-state POINT READ (the reference's
   * `flink-queryable-state` QueryableStateClient.getKvState, at the
   * nearest Spark-native equivalent): look up ONE key's current state
   * in a (running or stopped) query's checkpoint. The state source
   * prunes to the key's store partition via the pushed filter; the
   * result is the key's raw value struct as of the last committed
   * batch — the same read-committed snapshot semantics the reference's
   * queryable state serves. `stateVarName` as in [[savepointRead]]
   * (None for flatMapGroupsWithState operators, whose single state is
   * unnamed). */
  def pointRead(spark: SparkSession, ckpt: String, key: Any,
      stateVarName: Option[String] = None): Option[org.apache.spark.sql.Row] = {
    var r = spark.read.format("statestore")
    stateVarName.foreach(v => r = r.option("stateVarName", v))
    // a deliberate single-row driver read — the point lookup IS the
    // operation, exactly one key's value crosses to the caller
    r.load(ckpt)
      .filter(col("key.value") === lit(key))
      .select(col("value"))
      .head(1).headOption.map(_.getStruct(0))
  }
}
