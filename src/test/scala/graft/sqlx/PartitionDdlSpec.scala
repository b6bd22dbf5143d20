package graft.sqlx

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** ALTER TABLE ADD/DROP PARTITION (reference SqlAddPartitions /
 * SqlDropPartitions): directory semantics, idempotent IF [NOT] EXISTS
 * forms, SHOW PARTITIONS of registered-but-empty partitions,
 * loud-failure contracts, and a randomized model differential — a
 * scripted sequence of ADD/DROP/INSERT tracked against an in-test
 * model of (partitions present, rows per partition). */
class PartitionDdlSpec extends SparkSuite {

  private def freshTable(prefix: String): (String, String) = {
    val out = java.nio.file.Files.createTempDirectory(s"graft_$prefix").toString
    val name = s"${prefix}_t"
    Ddl.execute(spark,
      s"""CREATE TABLE $name (
            k BIGINT, v BIGINT, part STRING
          ) PARTITIONED BY (part)
          WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'parquet')""")
    (name, out)
  }

  private def parts(name: String): Set[String] =
    Ddl.execute(spark, s"SHOW PARTITIONS $name").collect()
      .map(_.getString(0)).toSet

  test("ADD/DROP PARTITION contracts: creation, pruning, idempotent forms, errors") {
    val (t, _) = freshTable("pddl")
    Ddl.execute(spark, s"INSERT INTO $t SELECT 1 AS k, 10 AS v, 'a' AS part")
    Ddl.execute(spark, s"INSERT INTO $t SELECT 2 AS k, 20 AS v, 'b' AS part")
    assert(parts(t) == Set("part=a", "part=b"))

    // ADD registers an empty partition; duplicate ADD needs IF NOT EXISTS
    Ddl.execute(spark, s"ALTER TABLE $t ADD PARTITION (part = 'c')")
    assert(parts(t) == Set("part=a", "part=b", "part=c"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t ADD PARTITION (part = 'c')"))
    Ddl.execute(spark, s"ALTER TABLE $t ADD IF NOT EXISTS PARTITION (part = 'c')")
    // an empty registered partition contributes no rows
    assert(spark.table(t).count() == 2)

    // DROP prunes the data and the registration
    Ddl.execute(spark, s"ALTER TABLE $t DROP PARTITION (part = 'a')")
    assert(parts(t) == Set("part=b", "part=c"))
    assert(spark.table(t).select(sum(col("v"))).head().getLong(0) == 20L)
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t DROP PARTITION (part = 'a')"))
    Ddl.execute(spark, s"ALTER TABLE $t DROP IF EXISTS PARTITION (part = 'a')")

    // spec validation: unknown key, non-partitioned table
    intercept[IllegalArgumentException](
      Ddl.execute(spark, s"ALTER TABLE $t ADD PARTITION (nope = 'x')"))
    val out2 = java.nio.file.Files.createTempDirectory("graft_pddl_np").toString
    Ddl.execute(spark,
      s"""CREATE TABLE pddl_np (k BIGINT) WITH
          ('connector' = 'filesystem', 'path' = '$out2', 'format' = 'parquet')""")
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "ALTER TABLE pddl_np ADD PARTITION (k = '1')"))
    Ddl.execute(spark, "DROP TABLE pddl_np")
    Ddl.execute(spark, s"DROP TABLE $t")
  }

  test("partition values with path-special chars use Hive escaping on disk") {
    val (t, out) = freshTable("pesc")
    // Spark's partitioned writer escapes '/', ':', '=' etc. in the
    // directory name; INSERT then DROP must agree on that name or DROP
    // silently prunes nothing
    Ddl.execute(spark, s"INSERT INTO $t SELECT 1 AS k, 10 AS v, '2021/01:a=b' AS part")
    assert(parts(t) == Set("part=2021/01:a=b")) // logical, value-derived
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator()
    val escaped = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("part=")).toSet
    assert(escaped == Set("part=2021%2F01%3Aa%3Db"), s"on-disk dirs: $escaped")
    Ddl.execute(spark, s"ALTER TABLE $t DROP PARTITION (part = '2021/01:a=b')")
    assert(parts(t).isEmpty)
    assert(spark.table(t).count() == 0)
    // ADD with a special value registers the logical name and creates
    // the ESCAPED directory (what a writer for the same value produces)
    Ddl.execute(spark, s"ALTER TABLE $t ADD PARTITION (part = 'x:y')")
    assert(parts(t) == Set("part=x:y"))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(out, "part=x%3Ay")))
    Ddl.execute(spark, s"DROP TABLE $t")
  }

  test("registrations are storage-durable: survive re-declaration, DROP TABLE, and other processes") {
    val (t, out) = freshTable("pdur")
    Ddl.execute(spark, s"ALTER TABLE $t ADD PARTITION (part = 'empty1')")
    // a registration made by ANOTHER process is just the escaped
    // directory — simulate one with a raw mkdir and expect SHOW
    // PARTITIONS to see it (the directory IS the registration)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out, "part=x%3Ay"))
    assert(parts(t) == Set("part=empty1", "part=x:y"))
    // DROP TABLE leaves external storage (and with it the registered
    // partitions) untouched; a re-declared table over the same path
    // sees them again — including in a fresh session
    Ddl.execute(spark, s"DROP TABLE $t")
    val ss = spark.newSession()
    Ddl.execute(ss,
      s"""CREATE TABLE $t (
            k BIGINT, v BIGINT, part STRING
          ) PARTITIONED BY (part)
          WITH ('connector' = 'filesystem', 'path' = '$out', 'format' = 'parquet')""")
    assert(Ddl.execute(ss, s"SHOW PARTITIONS $t").collect()
      .map(_.getString(0)).toSet == Set("part=empty1", "part=x:y"))
    Ddl.execute(ss, s"DROP TABLE $t")
  }

  test("randomized ADD/DROP/INSERT sequence tracks the model") {
    val rnd = new scala.util.Random(20260815L)
    val (t, _) = freshTable("pfuzz")
    val keys = ('a' to 'f').map(_.toString)
    // model: partition -> row count (present means registered or has data)
    val model = scala.collection.mutable.Map.empty[String, Long]
    var nextK = 0L
    for (step <- 0 until 40) {
      val p = keys(rnd.nextInt(keys.size))
      rnd.nextInt(3) match {
        case 0 => // INSERT one row into partition p
          nextK += 1
          Ddl.execute(spark, s"INSERT INTO $t SELECT $nextK AS k, ${nextK * 10} AS v, '$p' AS part")
          model(p) = model.getOrElse(p, 0L) + 1
        case 1 => // ADD IF NOT EXISTS (registers empty)
          Ddl.execute(spark, s"ALTER TABLE $t ADD IF NOT EXISTS PARTITION (part = '$p')")
          model.getOrElseUpdate(p, 0L)
        case _ => // DROP IF EXISTS (prunes rows + registration)
          Ddl.execute(spark, s"ALTER TABLE $t DROP IF EXISTS PARTITION (part = '$p')")
          model.remove(p)
      }
      if (step % 8 == 7) { // periodic full check
        assert(parts(t) == model.keySet.map(k => s"part=$k").toSet, s"step $step")
        val got = spark.table(t).groupBy(col("part")).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val exp = model.filter(_._2 > 0).toMap
        assert(got == exp, s"step $step: rows $got != model $exp")
      }
    }
    Ddl.execute(spark, s"DROP TABLE $t")
  }
}
