package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** An opaque media payload with typed metadata — the multimodal column
  * pattern: image/audio/video travel as `binary`, metadata as plain
  * columns, so Spark shuffles/prunes them like any other data.
  */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Features extracted from one payload by the (stubbed) decoder. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    first_byte: Long,
    fake_width: Long,
    fake_height: Long)

/** Multimodal processing plumbing. The decode step is a clearly-marked
  * STUB — image/audio codecs are not in this container — but the
  * Spark-side shape is real: binary columns, a typed `Dataset[T]`
  * surface, and partition-batched iteration (`mapPartitions` +
  * `grouped(batchSize)`, the Scala analogue of an Arrow-batched
  * `mapInPandas` decode: the decoder sees fixed-size batches, exactly
  * how a vectorized codec or an inference runtime wants its input).
  *
  * At 100 TB: payloads dominate row width, so the operator never
  * shuffles them — features are extracted scan-side and only the narrow
  * feature columns flow on.
  */
object Multimodal extends Serializable {

  val DefaultBatchSize = 64

  /** STUB decode — deterministic fake standing in for a real codec.
    * Derives pseudo-metadata from the payload bytes alone, so results
    * are reproducible and oracle-checkable. Replace the body with a real
    * decoder (JPEG/PNG header parse, audio frame count, ...) when codecs
    * are available.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val n     = payload.length.toLong
    val first = if (payload.isEmpty) 0L else payload(0) & 0xffL
    (first, n % 640, n % 480)
  }

  /** Batched feature extraction over a typed media dataset. */
  def extractFeatures(
      records: Dataset[MediaRecord],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one decoder invocation per batch — the real-codec seam
        batch.map { r =>
          val (first, w, h) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, first, w, h)
        }
      }
    }
  }

  /** Documents' text bytes as stand-in payloads (the fixture has no
    * binary table): text → binary keeps byte identity for ASCII corpora.
    */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  def features(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(s, dir)).toDF()

  /** Fixed-size frame geometry for [[frameSample]]: payloads are treated
    * as a sequence of [[FrameBytes]]-byte frames and every
    * [[FrameStride]]-th frame is sampled.
    */
  val FrameBytes  = 32
  val FrameStride = 4

  /** Frame sampling — the video/audio analogue of thumbnailing: emit one
    * probe byte per sampled frame (a real decoder would emit the decoded
    * frame or its embedding; the byte probe keeps the fixture
    * oracle-checkable). The whole operator is a scan-side generate +
    * projection: frame indices come from `sequence` over the payload
    * length, the byte is sliced in place, and the payload itself never
    * enters a shuffle — only (doc_id, frame_idx, frame_byte) flows on.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(s, dir)
      .toDF()
      .filter(length(col("payload")) >= FrameBytes)
      .select(
        col("doc_id"),
        col("media_type"),
        explode(expr(s"sequence(0, int(length(payload) / $FrameBytes) - 1, $FrameStride)"))
          .as("frame_idx"),
        col("payload"))
      .select(
        col("doc_id"),
        col("media_type"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr(s"CAST(conv(hex(substring(payload, frame_idx * $FrameBytes + 1, 1)), 16, 10) AS BIGINT)")
          .as("frame_byte"))

  /** Bounding box for [[resizePlan]]: longest output side. */
  val ResizeBox = 64

  /** Resize/thumbnail planning — the decode→resize→re-encode pipeline's
    * middle stage with the codec stubbed out: source dimensions come from
    * the [[decodeStub]] geometry, the target box fit (aspect-preserving,
    * downscale-only) is exact IEEE arithmetic, and the "resampled" output
    * is a 1-D nearest-neighbor byte resample of the payload (one strided
    * probe per output column, summed to a checksum the oracle can
    * replay). A real deployment swaps the probe lambda for a pixel
    * kernel; the plan shape — scan-side projection + generate, payload
    * never shuffled, only narrow columns flow on — is the real thing.
    * Zero-dimension payloads (the stub's `n % 640 == 0` wrap) are
    * filtered like undecodable frames.
    */
  def resizePlan(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(s, dir)
      .toDF()
      .select(
        col("doc_id"),
        col("media_type"),
        col("payload"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("src_w", col("n_bytes") % 640)
      .withColumn("src_h", col("n_bytes") % 480)
      .filter(col("src_w") > 0 && col("src_h") > 0)
      .withColumn("scale",
        least(lit(1.0), lit(ResizeBox.toDouble) / col("src_w"),
          lit(ResizeBox.toDouble) / col("src_h")))
      .withColumn("out_w", greatest(lit(1L), floor(col("src_w") * col("scale"))))
      .withColumn("out_h", greatest(lit(1L), floor(col("src_h") * col("scale"))))
      .withColumn("stride", expr("greatest(CAST(1 AS BIGINT), n_bytes div out_w)"))
      .select(
        col("doc_id"),
        col("media_type"),
        col("src_w"),
        col("src_h"),
        col("out_w"),
        col("out_h"),
        col("scale"),
        expr(s"""aggregate(
            transform(sequence(0, int(out_w) - 1),
              k -> CAST(conv(hex(substring(payload, int(k * stride) + 1, 1)), 16, 10) AS BIGINT)),
            CAST(0 AS BIGINT), (acc, b) -> acc + b)""").as("resample_sum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (features _),
    "multimodal_frames"   -> (frameSample _),
    "multimodal_resize"   -> (resizePlan _)
  )

  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
         octet_length(encode(text)) AS n_bytes,
         CASE WHEN length(text) = 0 THEN 0
              ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS BIGINT) END AS first_byte,
         octet_length(encode(text)) % 640 AS fake_width,
         octet_length(encode(text)) % 480 AS fake_height
         FROM documents""",
    "multimodal_frames" ->
      s"""SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
         CAST(i AS BIGINT) AS frame_idx,
         CAST('0x' || substr(hex(encode(text)), i * $FrameBytes * 2 + 1, 2) AS BIGINT) AS frame_byte
         FROM documents, unnest(range(0, octet_length(encode(text)) // $FrameBytes, $FrameStride)) AS t(i)
         WHERE octet_length(encode(text)) >= $FrameBytes""",
    "multimodal_resize" ->
      s"""WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
             encode(text) AS payload,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
           FROM documents),
         g AS (
           SELECT doc_id, media_type, payload, n_bytes,
             n_bytes % 640 AS src_w, n_bytes % 480 AS src_h
           FROM m WHERE n_bytes % 640 > 0 AND n_bytes % 480 > 0),
         r AS (
           SELECT *, least(CAST(1 AS DOUBLE), CAST($ResizeBox AS DOUBLE) / src_w,
             CAST($ResizeBox AS DOUBLE) / src_h) AS scale FROM g),
         o AS (
           SELECT *,
             greatest(1, CAST(floor(src_w * scale) AS BIGINT)) AS out_w,
             greatest(1, CAST(floor(src_h * scale) AS BIGINT)) AS out_h
           FROM r),
         st AS (SELECT *, greatest(1, n_bytes // out_w) AS stride FROM o)
         SELECT doc_id, media_type, src_w, src_h, out_w, out_h, scale,
           CAST(sum(CAST('0x' || substr(hex(payload), CAST(k * stride AS BIGINT) * 2 + 1, 2) AS BIGINT)) AS BIGINT)
             AS resample_sum
         FROM st, unnest(range(0, out_w)) AS t(k)
         GROUP BY 1, 2, 3, 4, 5, 6, 7"""
  )
}
