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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (features _),
    "multimodal_frames"   -> (frameSample _)
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
         WHERE octet_length(encode(text)) >= $FrameBytes"""
  )
}
