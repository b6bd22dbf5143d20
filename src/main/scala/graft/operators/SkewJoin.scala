package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys (SURVEY §2.3 scale notes; the
 * technique behind the reference's skew handling and Spark AQE's
 * skew-join split, usable when AQE's runtime split cannot help —
 * e.g. a single hot key inside one partition of a stateful stage).
 *
 * Mechanics: every probe-side row gets a deterministic salt in
 * [0, salts) hashed from its whole row, widening the hot key across
 * `salts` reducers; the build side replicates once per salt and the
 * join runs on (key, salt). The result is EXACTLY the plain join —
 * the salt only changes the partitioning — which is what the gate
 * query proves against the unsalted SQL oracle.
 *
 * Scale: build-side replication costs `salts ×` its size, so salt
 * counts stay small (8–32) and the build side should be the smaller
 * input; at that size Catalyst usually broadcasts it, making the
 * replication free (it rides inside the broadcast hash table).
 */
object SkewJoin {

  def saltedEquiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
