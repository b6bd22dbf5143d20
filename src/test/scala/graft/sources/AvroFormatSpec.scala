package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.types.StructType

/** Avro container format on the core avro jar: typed roundtrip and
 * schema-translation guardrails. */
class AvroFormatSpec extends SparkSuite {

  test("roundtrip preserves longs, doubles, strings and booleans") {
    import spark.implicits._
    val df = Seq((1L, 1.5, "a", true), (2L, -0.25, "Ünïcode", false))
      .toDF("id", "x", "s", "b")
    val path = java.nio.file.Files.createTempDirectory("graft_avro").toString
    AvroFormat.write(df.repartition(2), path)
    val back = AvroFormat.read(spark, path,
      StructType.fromDDL("id BIGINT, x DOUBLE, s STRING, b BOOLEAN"))
    assert(back.as[(Long, Double, String, Boolean)].collect().toSet ==
      Set((1L, 1.5, "a", true), (2L, -0.25, "Ünïcode", false)))
  }

  test("unsupported nested types raise at schema translation") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    intercept[IllegalArgumentException] { AvroFormat.avroSchema(df.schema) }
  }
}
