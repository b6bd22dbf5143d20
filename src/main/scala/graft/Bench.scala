package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * executed through a `noop` DataSource-V2 sink — unlike `count()`,
  * which lets Catalyst prune projections and skip most of the work for
  * projection-only queries. Failures are reported as value -1 and
  * listed in "failed", never silently swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/parquet/shuffle paths so the first timed queries
    // don't absorb one-time JVM startup cost
    try {
      Tables.load(spark, sfDir, "lineitem")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // self-diagnosing runs: per-query GC time and block-manager storage
    // residency ride along with the timings, so an environmental
    // outlier (cold page cache, memory pressure inflating late-alphabet
    // queries) is visible IN the artifact instead of a cross-run dispute
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    def storageBytes: Long =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0, ok, (gcMillis - gc0) / 1000.0, storageBytes)
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, _, g, _) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val resid = results.map { case (k, _, _, _, r) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _, _) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","gc_sec":$gcs,"storage_bytes":$resid}"""
    println(line)
    // the driver artifact preserves only the log tail, which truncates
    // ~50 of the per-query timings — persist the full JSON for audit
    // resolves against the working directory; SPARK_GRAFT_BENCH_OUT overrides
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] BENCH_FULL.json: ${e.getMessage}") }
    spark.stop()
  }
}
