package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Source/sink formats & utility connectors (SURVEY §2.1: reference
 * `flink-formats/flink-csv`, `flink-json`,
 * `DataGenTableSourceFactory.java`, `BlackHoleTableSinkFactory.java`):
 * declared-schema CSV/JSON reads (the reference never infers schema —
 * §1.3), a deterministic generated source, and a blackhole-sink
 * write-then-count. Roundtrips stage through a scratch dir — the write
 * path exercises the DSv2 file sinks.
 */
object FormatQueries extends QueryPack {

  private def scratch(dir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_fmt/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/$name"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CSV write → declared-schema read → aggregate. CSV has no types:
    // the declared schema (reference CsvRowDataDeserializationSchema
    // semantics) restores them.
    // Malformed-row tolerance (reference 'csv.ignore-parse-errors'
    // format option): injected bad lines are DROPPED, so the survivors
    // equal the clean table — which is exactly what the oracle checks.
    // The '999,NAME,not_a_number' line is the mode sentinel: its KEY
    // parses but its typed region column does not, so PERMISSIVE would
    // keep the row (999 leaks into key_sum under a null region) and
    // fail the gate — only DROPMALFORMED recovers the clean table.
    // (Over-arity alone is no sentinel: Spark truncates extra tokens.)
    "fmt_csv_malformed" -> ((s, dir) => {
      val path = scratch(dir, "nation_csv_bad")
      Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").csv(path)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, "zz_malformed.csv"),
        "not_a_number,BROKEN\nx,y,z\n999,NAME,not_a_number\n")
      s.read.schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .option("mode", "DROPMALFORMED").csv(path)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("key_sum"))
        .orderBy(col("n_regionkey"))
    }),

    "fmt_csv_roundtrip" -> ((s, dir) => {
      val path = scratch(dir, "nation_csv")
      val nation = Tables.load(s, dir, "nation")
      nation.select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .option("header", "true").csv(path)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
          sum(col("n_nationkey")).as("key_sum"))
        .orderBy(col("n_regionkey"))
    }),

    // JDBC connector round-trip (reference flink-connector-jdbc): write
    // into an embedded Derby database, read back as a PARTITIONED jdbc
    // scan (partitionColumn/bounds/numPartitions — the parallel-read
    // shape a networked warehouse gets at scale; embedded Derby is
    // single-JVM, which local mode satisfies) with a pushed predicate.
    "jdbc_roundtrip" -> ((s, dir) => {
      val db = s"${scratch(dir, "derby_db")}/nationdb"
      val url = s"jdbc:derby:$db;create=true"
      val props = Map(
        "url" -> url, "dbtable" -> "NATION_T",
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
      Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.format("jdbc").options(props)
        .option("createTableColumnTypes",
          "n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT")
        .mode("overwrite").save()
      s.read.format("jdbc").options(props)
        .option("partitionColumn", "n_nationkey")
        .option("lowerBound", "0").option("upperBound", "25")
        .option("numPartitions", "4")
        .load()
        .filter(col("n_regionkey") >= 1)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
          sum(col("n_nationkey")).as("key_sum"))
        .orderBy(col("n_regionkey"))
    }),

    // Compressed CSV round-trip (reference flink-formats/flink-compress
    // + CSV): codec is a write option, the reader decompresses by file
    // extension — behavior must match the uncompressed path exactly.
    "fmt_csv_gzip_roundtrip" -> ((s, dir) => {
      val path = scratch(dir, "nation_csv_gz")
      Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").option("header", "true")
        .option("compression", "gzip").csv(path)
      s.read.schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .option("header", "true").csv(path)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
          sum(col("n_nationkey")).as("key_sum"))
        .orderBy(col("n_regionkey"))
    }),

    // Plain text lines (reference DataSet.writeAsText:1575 /
    // readTextFile): one string column out, parse on the way back.
    "fmt_text_roundtrip" -> ((s, dir) => {
      val path = scratch(dir, "nation_text")
      Tables.load(s, dir, "nation")
        .select(concat_ws("|", col("n_nationkey"), col("n_name"),
          col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(split(col("value"), "\\|").as("f"))
        .select(col("f").getItem(0).cast("bigint").as("n_nationkey"),
          col("f").getItem(1).as("n_name"),
          col("f").getItem(2).cast("bigint").as("n_regionkey"))
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
          sum(col("n_nationkey")).as("key_sum"))
        .orderBy(col("n_regionkey"))
    }),

    // JSON-lines write → declared-schema read → aggregate.
    "fmt_json_roundtrip" -> ((s, dir) => {
      val path = scratch(dir, "orders_json")
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").json(path)
      s.read.schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
        .json(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100)).as("sum_cents"))
        .orderBy(col("o_orderstatus"))
    }),

    // Deterministic generated source (datagen analog): spark.range with
    // computed columns — no files, no RNG.
    "src_datagen" -> ((s, dir) => {
      s.range(0, 1000)
        .select(col("id"),
          (col("id") % 7).as("bucket"),
          md5(col("id").cast("string")).as("tag"))
        .orderBy(col("id"))
    }),

    // Avro container write → declared-schema read → aggregate. The
    // env lacks the spark-avro DataSource module, so this runs the
    // repo's own container-API format (graft.sources.AvroFormat).
    "fmt_avro_roundtrip" -> ((s, dir) => {
      val path = scratch(dir, "supplier_avro")
      graft.sources.AvroFormat.write(
        Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), path)
      graft.sources.AvroFormat.read(s, path,
          org.apache.spark.sql.types.StructType.fromDDL(
            "s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, s_acctbal DOUBLE"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), min(col("s_name")).as("first_name"),
          sum(floor(col("s_acctbal") * 100)).as("bal_cents"))
        .orderBy(col("s_nationkey"))
    }),

    // ORC write → read → aggregate (exercises the format-plugin path).
    "fmt_orc_roundtrip" -> ((s, dir) => {
      val path = scratch(dir, "part_orc")
      Tables.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_size")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("p_size").cast("long")).as("size_sum"))
        .orderBy(col("p_brand"))
    }),

    // Hadoop SequenceFile write → read → aggregate (reference
    // flink-formats/flink-sequence-file SequenceFileWriterFactory +
    // flink-hadoop-compatibility input path). SequenceFile is a K/V
    // container below the relational layer, so this is the sanctioned
    // RDD escape: writable conversion on write, typed sequenceFile[]
    // read, straight back into a DataFrame for the aggregate.
    "fmt_sequencefile_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = scratch(dir, "supplier_seq")
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(path), true)
      Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), concat_ws("|", col("s_name"),
          col("s_nationkey"), floor(col("s_acctbal") * 100).cast("long")).as("v"))
        .as[(Long, String)].rdd
        .saveAsSequenceFile(path)
      s.sparkContext.sequenceFile[Long, String](path).toDF("k", "v")
        .select(col("k").as("s_suppkey"), split(col("v"), "\\|").as("p"))
        .select(col("s_suppkey"), col("p").getItem(0).as("s_name"),
          col("p").getItem(1).cast("long").as("s_nationkey"),
          col("p").getItem(2).cast("long").as("bal_cents"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), min(col("s_name")).as("first_name"),
          sum(col("bal_cents")).as("bal_cents"))
        .orderBy(col("s_nationkey"))
    }),

    // Custom DSv2 source (FLIP-27 analog, graft.sources.DatagenSource):
    // split-planned bounded read; derived columns stay deterministic.
    "src_datagen_dsv2" -> ((s, dir) => {
      s.read.format("graft.sources.DatagenSource")
        .option("rows", "1000").option("partitions", "8").load()
        .select(col("id"), col("split"),
          (col("id") % 7).as("bucket"),
          md5(col("id").cast("string")).as("tag"))
        .orderBy(col("id"))
    }),

    // Blackhole/noop sink: fully execute a write with no output, then
    // report what was written (print/blackhole connector analog).
    "sink_blackhole" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      orders.write.format("noop").mode("overwrite").save()
      orders.agg(count(lit(1)).as("n_written"),
        sum(floor(col("o_totalprice") * 100)).as("sum_cents"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "fmt_csv_malformed" -> """
      SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "fmt_csv_roundtrip" -> """
      SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "jdbc_roundtrip" -> """
      SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation WHERE n_regionkey >= 1
      GROUP BY n_regionkey ORDER BY n_regionkey""",
    "fmt_csv_gzip_roundtrip" -> """
      SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "fmt_text_roundtrip" -> """
      SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "fmt_json_roundtrip" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders WHERE o_orderkey <= 2000
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "src_datagen" -> """
      SELECT range AS id, range % 7 AS bucket, md5(CAST(range AS VARCHAR)) AS tag
      FROM range(0, 1000) ORDER BY id""",
    "fmt_avro_roundtrip" -> """
      SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
             min(s_name) AS first_name,
             CAST(sum(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      FROM supplier GROUP BY 1 ORDER BY s_nationkey""",
    "fmt_orc_roundtrip" -> """
      SELECT p_brand, count(*) AS n,
             CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS size_sum
      FROM part GROUP BY p_brand ORDER BY p_brand""",
    "fmt_sequencefile_roundtrip" -> """
      SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
             min(s_name) AS first_name,
             CAST(sum(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      FROM supplier GROUP BY 1 ORDER BY s_nationkey""",
    "src_datagen_dsv2" -> """
      SELECT range AS id, CAST(range // 125 AS INT) AS split,
             range % 7 AS bucket, md5(CAST(range AS VARCHAR)) AS tag
      FROM range(0, 1000) ORDER BY id""",
    "sink_blackhole" -> """
      SELECT count(*) AS n_written,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders"""
  )
}
