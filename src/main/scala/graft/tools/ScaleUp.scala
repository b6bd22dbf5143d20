package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Deterministic scale-up generator: reads one driver-generated sf dir
 * (TESTDATA.md) and writes an N×-larger dir with the same schema and
 * referential integrity, by unioning N key-shifted copies.
 *
 * Why shifted copies instead of a fresh random generator: the driver's
 * distributions (date ranges, categorical frequencies, text near-dup
 * structure, skew) are preserved exactly per copy, so plans exercised
 * at sf0.1 meet the same data shapes at sf1 — only bigger. This mirrors
 * how the reference stresses its own SQL stack at SF=1
 * (flink-end-to-end-tests/test-scripts/test_tpcds.sh:22,
 * TpcdsTestProgram.java:76).
 *
 * Determinism rules (no RNG anywhere, so two runs are byte-identical in
 * content):
 *  - every key column shifts by copy * (max(referenced pk)+1); all FK
 *    references shift by the SAME stride as their PK, so joins land on
 *    the matching copy and integrity holds;
 *  - fixed dimensions (region, nation) are NOT scaled — like TPC-H;
 *  - continuous doubles gain copy*1e-4 and events.ts gains copy
 *    microseconds, so a value unique at the source scale stays unique
 *    at the target scale (no manufactured top-k ties that would make a
 *    tie-unbroken ORDER BY ... LIMIT nondeterministic between engines);
 *  - embedding vectors gain a tiny per-copy, per-dimension offset so
 *    nearest-neighbor distances never tie exactly across copies;
 *  - document text is copied verbatim: exact/near duplicate CLUSTERS
 *    grow with scale, which is exactly what a crawl corpus does and
 *    what the dedup family must absorb.
 *
 * Scale design: the copy frame is a broadcast of N rows crossed against
 * each table scan — one narrow map stage per table, no shuffle; output
 * is repartitioned only to keep file counts sane. At 100 TB you would
 * run the same plan with a larger copies count and let the cluster
 * write in parallel.
 */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (srcDir, outDir, copies) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def tbl(n: String): DataFrame = Tables.load(spark, srcDir, n)
    def stride(n: String, pk: String): Long =
      tbl(n).agg(max(col(pk))).as[Long].head() + 1L

    // PK strides, computed from the SOURCE so the tool works on any sf
    val sOrder = stride("orders", "o_orderkey")
    val sCust  = stride("customer", "c_custkey")
    val sPart  = stride("part", "p_partkey")
    val sSupp  = stride("supplier", "s_suppkey")
    val sEvent = stride("events", "event_id")
    val sUser  = tbl("events").agg(max($"user_id")).as[Long].head() + 1L
    val sDoc   = stride("documents", "doc_id")
    val sVec   = stride("embeddings", "vec_id")

    val copyDf = broadcast(spark.range(copies).select($"id".as("__copy")))

    // single-file-per-table output, matching the driver's sf dirs so
    // every consumer (Tables.load, the DuckDB oracle) reads it as-is;
    // a 10× run stays well under one parquet file's comfort zone and
    // Spark still splits the file by row group on read
    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$outDir/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, Paths.get(s"$outDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.list(Paths.get(tmp)).forEach(Files.delete(_))
      Files.delete(Paths.get(tmp))
    }
    def scaled(name: String)(f: DataFrame => DataFrame): Unit = {
      val src = tbl(name)
      val out = f(src.crossJoin(copyDf))
        .select(src.columns.map(col): _*) // original order, __copy gone
      writeOne(out, name)
      println(s"[scaleup] $name -> ${copies}x")
    }
    def copyAsIs(name: String): Unit = {
      writeOne(tbl(name), name)
      println(s"[scaleup] $name -> 1x (fixed dimension)")
    }
    def shift(c: String, s: Long) = col(c) + col("__copy") * s
    // tie-breaking epsilon for continuous doubles (invisible at the
    // 1e2..1e5 magnitudes of prices/balances, kills cross-copy ties)
    def eps(c: String) = col(c) + col("__copy") * lit(1e-4)

    copyAsIs("region")
    copyAsIs("nation")

    scaled("customer")(_.withColumn("c_custkey", shift("c_custkey", sCust))
      .withColumn("c_acctbal", eps("c_acctbal"))
      .withColumn("c_name", concat($"c_name", when($"__copy" === 0, lit(""))
        .otherwise(concat(lit("#x"), $"__copy")))))

    scaled("supplier")(_.withColumn("s_suppkey", shift("s_suppkey", sSupp))
      .withColumn("s_acctbal", eps("s_acctbal"))
      .withColumn("s_name", concat($"s_name", when($"__copy" === 0, lit(""))
        .otherwise(concat(lit("#x"), $"__copy")))))

    scaled("part")(_.withColumn("p_partkey", shift("p_partkey", sPart))
      .withColumn("p_retailprice", eps("p_retailprice")))

    scaled("orders")(_.withColumn("o_orderkey", shift("o_orderkey", sOrder))
      .withColumn("o_custkey", shift("o_custkey", sCust))
      .withColumn("o_totalprice", eps("o_totalprice")))

    scaled("lineitem")(_.withColumn("l_orderkey", shift("l_orderkey", sOrder))
      .withColumn("l_partkey", shift("l_partkey", sPart))
      .withColumn("l_suppkey", shift("l_suppkey", sSupp))
      .withColumn("l_extendedprice", eps("l_extendedprice")))

    // events.ts arrives as TIMESTAMP_NTZ(µs) from Tables.load (which
    // normalizes the driver's TIMESTAMP(NANOS)); +copy µs keeps every
    // ts unique without moving any row across a window boundary
    scaled("events")(_.withColumn("event_id", shift("event_id", sEvent))
      .withColumn("user_id", shift("user_id", sUser))
      .withColumn("value", eps("value"))
      .withColumn("ts", expr("timestampadd(MICROSECOND, __copy, ts)")))

    // Documents: copy 1 is VERBATIM (exact-duplicate clusters grow with
    // scale, like a crawl snapshot); copies >= 2 suffix every word with
    // the copy id, giving each copy a DISJOINT vocabulary. The driver's
    // synthetic corpus draws from a ~30-word vocabulary, so its shingle
    // space saturates: 10 verbatim copies drive shingle doc-frequencies
    // and minhash-band collisions up ~10× and every pair-space ~100× —
    // the engine's capped/bucketed plans absorb that, but quadratic
    // dup-cluster growth is not how a corpus scales (dup RATE grows,
    // cluster sizes don't — a real crawl's vocabulary is open), and it
    // makes exact quadratic baselines (the DuckDB gating oracle)
    // infeasible at large factors. Word COUNT per doc is preserved;
    // n_chars is recomputed to stay consistent with the text.
    scaled("documents")(df => df
      .withColumn("doc_id", shift("doc_id", sDoc))
      .withColumn("text", when($"__copy" <= 1, $"text").otherwise(
        array_join(
          transform(split($"text", " "),
            w => concat(w, lit("~"), $"__copy".cast("string"))),
          " ")))
      .withColumn("n_chars", when($"__copy" <= 1, $"n_chars")
        .otherwise(length($"text").cast("long"))))

    // per-copy, per-dimension float offset (max ±9e-5) so no two copies
    // of a vector are equidistant from any query point
    scaled("embeddings")(_.withColumn("vec_id", shift("vec_id", sVec))
      .withColumn("embedding", when($"__copy" === 0, $"embedding").otherwise(
        zip_with($"embedding",
          transform(sequence(lit(0), size($"embedding") - 1),
            j => (($"__copy" * 97 + j * 31) % 19 - lit(9)).cast("float") * lit(1e-5f)),
          (v, d) => v + d))))

    spark.stop()
  }
}
