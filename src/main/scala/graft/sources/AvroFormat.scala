package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro container-file format (reference `flink-formats/flink-avro/...
 * /AvroRowDataDeSerializationSchema.java` + `AvroFileFormatFactory`):
 * the environment ships the core avro jar but not the spark-avro
 * DataSource module, so the format is implemented directly on the
 * Avro container API — schema translation for flat rows, one
 * container file per partition on write, file-parallel read.
 *
 * This is per-partition imperative I/O, the sanctioned RDD use case:
 * no driver materialization (the driver only lists file names, as any
 * file source does), each executor streams its own partition/file.
 */
object AvroFormat {

  /** Translate a flat Spark schema (long/int/double/string/boolean) to
   * an Avro record schema; nested/other types raise. */
  def avroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case other => throw new IllegalArgumentException(
          s"AvroFormat: unsupported type $other for field ${f.name}")
      }
      fields.add(new Schema.Field(f.name, t, null, null))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Write each partition as one Avro container file under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val names = df.schema.fieldNames
    val dir = new java.io.File(path)
    dir.mkdirs()
    dir.listFiles().filter(_.getName.endsWith(".avro")).foreach(_.delete())
    df.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, new java.io.File(path, f"part-$i%05d.avro"))
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          names.indices.foreach(j => rec.put(names(j), row.get(j)))
          w.append(rec)
        }
        w.close()
      }
      Iterator.single(0)
    }.count() // force the write job
  }

  /** Read an Avro container dir with a declared schema (the reference
   * never infers — SURVEY §1.3), one read task per file. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).toSeq.sorted
    val fields = schema.fields.map(f => (f.name, f.dataType)).toSeq
    val rdd = spark.sparkContext.parallelize(files, math.max(files.size, 1)).flatMap { p =>
      val r = new DataFileReader(new java.io.File(p), new GenericDatumReader[GenericRecord]())
      import scala.jdk.CollectionConverters._
      val rows = r.iterator().asScala.map { rec =>
        Row.fromSeq(fields.map { case (n, dt) =>
          (rec.get(n), dt) match {
            case (u: org.apache.avro.util.Utf8, _) => u.toString
            // widen when the declared type is wider than the stored one
            case (i: java.lang.Integer, LongType) => i.longValue()
            case (fl: java.lang.Float, DoubleType) => fl.doubleValue()
            case (x, _) => x
          }
        })
      }.toList
      r.close()
      rows
    }
    spark.createDataFrame(rdd, schema)
  }
}
