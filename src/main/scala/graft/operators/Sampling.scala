package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines (SURVEY §7.4
 * llmops): reproducible train/val assignment and per-stratum sampling
 * that any engine recomputes identically — no RNG state, no seed
 * plumbing, the split of a row is a pure function of its id.
 *
 * The hash is overflow-safe integer arithmetic on a BIGINT id
 * (`(id mod 1000003) * 2654435761 mod 1000000007` — max intermediate
 * ~2.7e15, well inside Int64), so Spark and the DuckDB oracle agree
 * bit-for-bit. NOT a cryptographic or even particularly strong hash —
 * it only needs to decorrelate the split from id order.
 *
 * Scale: both operators are one columnar expression (split) or one
 * window rank per stratum (sample) — no shuffle beyond the rank's
 * per-stratum sort, which AQE sizes like any Top-N.
 */
object Sampling {

  /** The deterministic per-id hash both engines compute exactly.
   * `pmod` (not `%`) on the outer reduction: a truncating mod would
   * map every negative id below the split threshold, collapsing the
   * ~trainPct% contract for signed id spaces. */
  def detHash(id: Column): Column =
    pmod((id % 1000003L) * 2654435761L, lit(1000000007L))

  /** Add a `split` column: 'train' for ~`trainPct`% of rows, 'val' for
   * the rest — stable across runs, engines, and partitionings. */
  def trainValSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100, "trainPct in (0, 100)")
    df.withColumn("split",
      when(detHash(col(idCol)) % 100 < trainPct, "train").otherwise("val"))
  }

  /** Keep `k` rows per stratum, chosen by deterministic hash order
   * (ties by id): a reproducible stratified sample. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(detHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Sample a corpus down to per-domain quotas (static mixture
   * weights × token/doc budget, the DoReMi/static-mix recipe):
   * each stratum keeps its `quotas(stratum)` lowest-hash rows, with
   * the selection rank exposed as `rk`. Strata not in `quotas` are
   * dropped. The constant `rn <= max(quota)` conjunct keeps the
   * filter WindowGroupLimit-eligible (per-partition partial top-k
   * before the full per-stratum sort), so the scan never sorts more
   * than max-quota rows per partition at scale. */
  /** Assign rows, in deterministic hash order, to contiguous shards
   * of ~`budget` total weight — the token-budget shard writer of a
   * training pipeline (each output shard carries about the same token
   * count). A row belongs to the shard where its running-sum START
   * offset lands (floor(start/budget)), so shard boundaries never
   * reorder the deterministic sequence.
   *
   * Scale: the global cumulative sum is TWO-PHASE — rows bucket by a
   * RANGE of the deterministic hash (a pure function of the id, no
   * counting pass), the cumsum runs within each bounded bucket, and
   * the bucket totals (one `buckets`-row frame) are prefix-summed and
   * broadcast back as offsets. No single-partition pass ever touches
   * the data. */
  def tokenBudgetShards(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0 && buckets > 0, "tokenBudgetShards needs positive budget/buckets")
    val bWidth = 1000000007L / buckets + 1
    val withB = df.withColumn("__h", detHash(col(idCol)))
      .withColumn("__b", expr(s"__h div $bWidth"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
    val cum = withB.withColumn("__cum_in", sum(col(weightCol)).over(wIn))
    val offsets = withB.groupBy(col("__b")).agg(sum(col(weightCol)).as("__btot"))
      .withColumn("__off", coalesce(sum(col("__btot")).over(
        Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__b"), col("__off"))
    cum.join(broadcast(offsets), Seq("__b"))
      .withColumn("start_tok", col("__off") + col("__cum_in") - col(weightCol))
      .withColumn("shard_id", expr(s"start_tok div $budget"))
      .drop("__h", "__b", "__cum_in", "__off")
  }

  /** Temperature-scaled mixture quotas (the multilingual-LM sampling
   * recipe at T = 2, i.e. p_l ∝ n_l^0.5): stratum l keeps
   * floor(total · w_l / Σw) lowest-hash rows, where w_l =
   * floor(1e6 · sqrt(n_l)) — the tail upsampled relative to
   * proportional sampling without drowning the head. sqrt is the one
   * floating-point step and IEEE-754 requires it correctly rounded, so
   * the integer weights are engine-exact; the quota split is integer
   * division. Scale: the weight frame is one row per stratum (tiny,
   * broadcast back onto the corpus); the rank is the same per-stratum
   * sort as [[mixDomains]]. */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
      total: Int): DataFrame = {
    require(total > 0, "temperatureMix needs a positive row budget")
    // the weight frame is one row per stratum, so the all-rows window
    // total costs one single-partition pass over a tiny frame. NOTE:
    // the total must NOT be named __W — Spark column names are
    // case-insensitive, so withColumn("__W") would silently REPLACE __w.
    val quotas = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .select(col(strataCol),
        floor(lit(1000000.0) * sqrt(col("__n").cast("double"))).cast("long").as("__w"))
      .withColumn("__wtot", sum(col("__w")).over(Window.partitionBy(lit(1))))
      .select(col(strataCol),
        expr(s"CAST((CAST($total AS BIGINT) * __w) div __wtot AS INT)").as("__quota"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(detHash(col(idCol)), col(idCol))
    df.join(broadcast(quotas), Seq(strataCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .withColumn("rk", col("__rn").cast("int"))
      .drop("__rn", "__quota")
  }

  def mixDomains(df: DataFrame, strataCol: String, idCol: String,
      quotas: Map[String, Int]): DataFrame = {
    require(quotas.nonEmpty, "mixDomains needs at least one quota")
    val maxQ = quotas.values.max
    val quotaCol = quotas.foldLeft(lit(0)) { case (acc, (stratum, q)) =>
      when(col(strataCol) === stratum, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(detHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxQ && col("__rn") <= quotaCol)
      .withColumn("rk", col("__rn").cast("int"))
      .drop("__rn")
  }
}
