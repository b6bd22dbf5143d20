package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column operators (SURVEY §7.4 M5): binary payload +
 * metadata struct, metadata-pruned filtering, dedup by content hash,
 * frame sampling, and the partition-wise decode stub. Oracle side: the
 * corpus is pure ASCII, so DuckDB's char-based ops on `text` equal
 * Spark's byte-based ops on the UTF-8 payload (verified: 0 rows where
 * octet_length(encode(text)) <> length(text)).
 */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata projection + filter: payload column never read by the
    // aggregate (columnar pruning at 100 TB).
    "mm_ingest_meta" -> ((s, dir) => {
      Multimodal.ingest(Tables.load(s, dir, "documents"))
        .filter(col("meta.n_bytes") > 200)
        .select(col("doc_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .orderBy(col("doc_id"))
    }),

    // Exact dedup by payload content hash (the binary analog of
    // dedup_exact_text).
    "mm_dedup_binary" -> ((s, dir) => {
      Multimodal.ingest(Tables.load(s, dir, "documents"))
        .groupBy(md5(col("payload")).as("content_key"))
        .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_copies"),
          min(col("meta.mime")).as("mime"))
        .orderBy(col("content_key"))
    }),

    // Frame sampling: every 4th 256-byte chunk, hashed.
    "mm_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.ingest(Tables.load(s, dir, "documents").filter(col("doc_id") <= 100)),
          frameBytes = 256, every = 4)
        .select(col("doc_id"), col("frame_no"),
          length(col("frame")).cast("bigint").as("frame_len"),
          md5(col("frame")).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_no"))
    }),

    // Partition-wise decode STUB: deterministic fake feature (byte-sum
    // mod prime) through real mapPartitions plumbing.
    "mm_decode_stub" -> ((s, dir) => {
      Multimodal.decodeFeatures(
          Multimodal.ingest(Tables.load(s, dir, "documents")))
        .toDF()
        .orderBy(col("doc_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "mm_ingest_meta" -> """
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                             ELSE 'video/mp4' END AS mime,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
             CAST(64 + (doc_id % 5) * 16 AS INT) AS height
      FROM documents
      WHERE octet_length(encode(text)) > 200
      ORDER BY doc_id""",
    "mm_dedup_binary" -> """
      SELECT md5(text) AS content_key, min(doc_id) AS keep_doc,
             count(*) AS n_copies,
             min(CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                                 ELSE 'video/mp4' END) AS mime
      FROM documents GROUP BY 1 ORDER BY content_key""",
    "mm_frame_sample" -> """
      WITH f AS (
        SELECT doc_id, text, unnest(range(0,
                 greatest(CAST(ceil(length(text) / 256.0) AS INT), 1), 4)) AS frame_no
        FROM documents WHERE doc_id <= 100)
      SELECT doc_id, frame_no,
             CAST(length(substring(text, frame_no * 256 + 1, 256)) AS BIGINT) AS frame_len,
             md5(substring(text, frame_no * 256 + 1, 256)) AS frame_md5
      FROM f ORDER BY doc_id, frame_no""",
    "mm_decode_stub" -> """
      WITH b AS (SELECT doc_id, text,
                        unnest(range(1, length(text) + 1)) AS i
                 FROM documents),
      s AS (SELECT doc_id, CAST(sum(ascii(substring(text, i, 1))) AS BIGINT) AS bytesum
            FROM b GROUP BY doc_id)
      SELECT d.doc_id,
             CASE d.doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                               ELSE 'video/mp4' END AS mime,
             CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
             s.bytesum % 2147483647 AS feature
      FROM documents d JOIN s USING (doc_id)
      ORDER BY d.doc_id"""
  )
}
