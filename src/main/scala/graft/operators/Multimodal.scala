package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-asset feature row produced by the (stubbed) decoder. */
case class MmFeature(doc_id: Long, mime: String, n_bytes: Long, feature: Long)

/**
 * Multimodal column convention (SURVEY §7.4 M5): an asset is an opaque
 * `binary` payload column plus a typed metadata struct
 * (mime/n_bytes/width/height). At 100 TB the payload column lives in
 * parquet/iceberg alongside the metadata — predicate pushdown prunes on
 * metadata WITHOUT reading payload bytes (columnar format reads only
 * projected columns), which is the whole point of the convention.
 *
 * The test corpus has no real images, so payloads here are the UTF-8
 * document bytes and "decode" is a STUB (deterministic fake features) —
 * the Spark-side plumbing (binary columns, metadata struct, chunked
 * frame access, partition-wise decode with one decoder instance per
 * partition) is real and is what the queries/specs verify.
 */
object Multimodal {

  /** Attach payload + metadata struct to the documents table. Fake
   * dims/mime are derived deterministically from doc_id (the stand-in
   * for a real extractor's output). */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 16).cast("int").as("height")))

  /** Sample every `every`-th fixed-size byte chunk ("frame") of the
   * payload — the frame-sampling plan shape for video: a map-side
   * posexplode bounded by n_bytes/frameBytes, no shuffle. */
  def sampleFrames(assets: DataFrame, frameBytes: Int, every: Int): DataFrame =
    assets
      .withColumn("frame_no",
        explode(sequence(lit(0),
          greatest(ceil(col("meta.n_bytes") / frameBytes).cast("int") - 1, lit(0)),
          lit(every))))
      .withColumn("frame", expr(s"substring(payload, frame_no * $frameBytes + 1, $frameBytes)"))

  /** STUB decoder: stands in for an image/audio decode library (not in
   * this container). One "decoder" per partition, streaming — the real
   * integration point swaps `fakeDecode` for the codec call, keeping
   * the exact same partition-wise plumbing and output schema. */
  def decodeFeatures(assets: DataFrame): Dataset[MmFeature] = {
    import assets.sparkSession.implicits._
    assets.select(col("doc_id"), col("meta.mime"), col("meta.n_bytes"), col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new FakeDecoder // per-partition, like a codec handle
        it.map { case (id, mime, n, payload) =>
          MmFeature(id, mime, n, decoder.fakeDecode(payload))
        }
      }
  }

  /** Deterministic fake: sum of byte values mod a prime. A real decoder
   * would produce pixels/samples here. */
  private[operators] class FakeDecoder extends Serializable {
    def fakeDecode(payload: Array[Byte]): Long = {
      var s = 0L
      var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
      s % 2147483647L
    }
  }
}
