package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque `binary` payloads + typed metadata, with the
  * decode step stubbed (no image/audio libs in this container — the
  * Spark-side plumbing is real, the codec is a deterministic fake).
  *
  * Model: a media table `(doc_id, payload: binary, meta: struct)` — here
  * derived from `documents` by treating UTF-8 text bytes as the payload,
  * exactly how a real pipeline treats JPEG/FLAC bytes: never parsed by
  * Catalyst, only by the per-partition decode.
  *
  * Scale design:
  *   - payloads stay in binary columns (parquet keeps them compressed,
  *     column pruning skips them unless the decode stage runs);
  *   - decode runs in `mapPartitions` — one codec instance per partition,
  *     batch-amortized, the Scala analogue of `mapInPandas` batches;
  *   - features come back as fixed-width arrays, so downstream similarity
  *     ops (graft.operators.Similarity) apply unchanged.
  */
object Multimodal {

  /** Attach the opaque payload + typed metadata (length, content hash,
    * declared mime). Pure projection — codegen'd, no data copy beyond the
    * UTF-8 encode. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("byte_len"),
        md5(encode(col("text"), "UTF-8")).as("content_md5"),
        lit("text/plain").as("mime")).as("meta"))

  /** Deterministic frame sampling: `frame_count = byte_len DIV bytesPerFrame`
    * frames per payload, one output row per sampled frame index (stride
    * `stride`). The explode is the real plumbing; a video pipeline swaps
    * the count derivation for container metadata. */
  def frameSample(media: DataFrame, bytesPerFrame: Int, stride: Int): DataFrame =
    media
      .withColumn("frame_count",
        floor(col("meta.byte_len") / lit(bytesPerFrame)).cast(IntegerType))
      .filter(col("frame_count") > 0)
      .select(col("doc_id"), col("frame_count"),
        explode(sequence(lit(0), col("frame_count") - 1, lit(stride)))
          .as("frame_idx"))

  /** Deterministic "resize": normalize every payload to exactly
    * `targetBytes` (truncate or zero-pad) and update the metadata to
    * match. Stands in for image resize / audio resample — the real
    * transform swaps the byte slice for a codec call; the Spark contract
    * (binary in, fixed-size binary out, meta kept honest) is identical.
    * Pure projection: codegen'd, no partition reshaping. */
  def resizePayload(media: DataFrame, targetBytes: Int): DataFrame =
    media
      // materialize the resized bytes ONCE, then derive meta from the
      // same column — duplicating the resize expression would let the
      // hash and the payload drift apart under a future edit
      .select(col("doc_id"),
        rpad(substring(col("payload"), 1, targetBytes), targetBytes,
          Array[Byte](0)).as("payload"),
        col("meta.mime").as("mime"))
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          // octet_length, not lit(targetBytes): NULL payloads must get
          // NULL byte_len, not a fixed-size claim for absent bytes
          octet_length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_md5"),
          col("mime")).as("meta"))

  /** Feature row produced by the stubbed decoder. */
  final case class MediaFeatures(
      doc_id: Long, byte_len: Int, histogram: Array[Double])

  /** STUB DECODER — deterministic fake standing in for image/audio decode
    * (the real codec is not installable here). Produces a 16-bin byte
    * histogram normalized to sum 1, which has the exact shape (fixed-width
    * double vector per row) a real embedding/feature extractor returns.
    *
    * The mapPartitions structure is the real contract: per-partition
    * initialization (a codec handle, here trivial), streaming batch
    * iteration, no driver involvement. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" init would go here
        rows.map { case (id, bytes) =>
          val hist = new Array[Double](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) / 16) += 1.0; i += 1 }
          // empty payload → all-zero histogram, not 0/0 = NaN poison
          if (bytes.length > 0) {
            val total = bytes.length.toDouble
            var b = 0
            while (b < 16) { hist(b) = hist(b) / total; b += 1 }
          }
          MediaFeatures(id, bytes.length, hist)
        }
      }(Encoders.product[MediaFeatures])
  }
}
