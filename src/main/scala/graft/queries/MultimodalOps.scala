package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal inventory: opaque binary payload + typed metadata, frame
  * sampling, and the (stubbed) per-partition decode. */
object MultimodalOps {

  val entries: Seq[Entry] = Seq(

    // payload metadata projection (binary column + typed struct).
    Entry(
      "mm_binary_meta",
      (s, dir) => Multimodal.asMedia(Tables(s, dir, "documents"))
        .select(
          col("doc_id"),
          col("meta.byte_len").as("byte_len"),
          col("meta.content_md5").as("content_md5"),
          col("meta.mime").as("mime"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
                     md5(text) AS content_md5,
                     'text/plain' AS mime
              FROM documents ORDER BY doc_id""")),

    // deterministic frame sampling (1 row per sampled frame index).
    Entry(
      "mm_frame_sample",
      (s, dir) => Multimodal
        .frameSample(Multimodal.asMedia(Tables(s, dir, "documents")), 32, 2)
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH m AS (
                SELECT doc_id,
                       CAST(FLOOR(octet_length(encode(text)) / 32.0) AS INTEGER) AS frame_count
                FROM documents)
              SELECT doc_id, frame_count,
                     CAST(unnest(generate_series(0, frame_count - 1, 2)) AS INTEGER) AS frame_idx
              FROM m WHERE frame_count > 0
              ORDER BY doc_id, frame_idx""")),

    // stubbed decode → fixed-width feature vectors via mapPartitions.
    // The histogram is a deterministic fake decode (no codecs in this
    // container); array<double> output is not ANSI-SQL-comparable →
    // rows-only check + MultimodalSpec asserts the values.
    Entry(
      "mm_decode_features",
      (s, dir) => Multimodal
        .decodeFeatures(s, Multimodal.asMedia(Tables(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id"),
      None)
  )
}
