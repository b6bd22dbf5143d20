package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/**
 * Deterministic datagen as a full DataSource-V2 source — the Spark
 * shape of the reference's FLIP-27 unified source (SURVEY §2.1:
 * `Source.java` / `SplitEnumerator` / `SourceReader`, and
 * `DataGenTableSourceFactory.java`): ONE source serving bounded (Batch)
 * and unbounded (MicroBatchStream) reads from the same split logic.
 *
 *  - split planning (`planInputPartitions`) ≈ SplitEnumerator: the id
 *    range is cut into `partitions` contiguous splits;
 *  - `PartitionReader` ≈ SourceReader: streams rows of its split;
 *  - offsets (row high-watermark) ≈ checkpointed enumerator state.
 *
 * Usage: `spark.read.format("graft.sources.DatagenSource")
 *   .option("rows", 1000).option("partitions", 8).load()`
 * (same for `readStream`). Schema: (id BIGINT, split INT). No RNG —
 * derived columns stay oracle-reproducible.
 */
class DatagenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DatagenSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DatagenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object DatagenSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("split", IntegerType, nullable = false)))

  private[sources] def splits(rows: Long, parts: Int): Array[InputPartition] = {
    val per = rows / parts
    (0 until parts).map { i =>
      DatagenSplit(i, i * per, if (i == parts - 1) rows else (i + 1) * per): InputPartition
    }.toArray
  }
}

private[sources] class DatagenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"datagen($rows, $parts)"
  override def schema(): StructType = DatagenSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new DatagenScan(rows, parts) }
}

private[sources] class DatagenScan(rows: Long, parts: Int) extends Scan with Batch {
  override def readSchema(): StructType = DatagenSource.Schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DatagenMicroBatch(rows, parts)
  override def planInputPartitions(): Array[InputPartition] = DatagenSource.splits(rows, parts)
  override def createReaderFactory(): PartitionReaderFactory = new DatagenReaderFactory
}

private[sources] case class DatagenSplit(idx: Int, start: Long, end: Long) extends InputPartition

private[sources] class DatagenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[DatagenSplit]
    new PartitionReader[InternalRow] {
      private var cur = s.start - 1
      override def next(): Boolean = { cur += 1; cur < s.end }
      override def get(): InternalRow = InternalRow(cur, s.idx)
      override def close(): Unit = ()
    }
  }
}

/** Unbounded face of the same source: the full range arrives as the
 * first micro-batch (offset = row high-watermark). */
private[sources] class DatagenMicroBatch(rows: Long, parts: Int) extends MicroBatchStream {
  private case class Off(v: Long) extends Offset { override def json(): String = v.toString }
  override def initialOffset(): Offset = Off(0)
  override def latestOffset(): Offset = Off(rows)
  override def deserializeOffset(json: String): Offset = Off(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[Off].v
    val e = end.asInstanceOf[Off].v
    if (s >= e) Array.empty else DatagenSource.splits(rows, parts)
  }
  override def createReaderFactory(): PartitionReaderFactory = new DatagenReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
