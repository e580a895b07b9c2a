package graft.queries

import graft.{Multimodal, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column queries (builder mandate; see [[graft.Multimodal]]). */
object Media {

  /** Binary metadata via pure SQL arithmetic (oracled): byte length, sha256
    * fingerprint, fake decoded dims — the binary column flows through the
    * plan as an opaque value. Dims derive from the BYTE length of the
    * media column (same quantity [[graft.Multimodal.decodeStub]] uses), so
    * the arithmetic and decode paths agree on non-ASCII corpora too. */
  def qMultimodalMeta(s: SparkSession, sf: String): DataFrame =
    Multimodal.mediaTable(s, sf)
      .withColumn("byte_len", length(col("media")))
      .select(
        col("doc_id"),
        col("byte_len"),
        sha2(col("media"), 256).as("content_sha"),
        (lit(64) + col("byte_len") % 512).as("width"),
        (lit(64) + (col("byte_len") * 7) % 512).as("height"),
        (lit(1) + col("byte_len") % 8).as("n_frames"))
      .orderBy("doc_id")

  /** The mapPartitions decode-stub path (NOT oracled — UDF-opaque);
    * scalatest cross-validates it against qMultimodalMeta's arithmetic. */
  def qMultimodalDecode(s: SparkSession, sf: String): DataFrame =
    Multimodal.decodeAll(Multimodal.mediaTable(s, sf))
      .toDF()
      .select("doc_id", "byte_len", "width", "height", "n_frames")
      .orderBy("doc_id")

  /** Frame-sampling layout — the video-preprocessing shape: each media
    * item's frame index space is sampled at a uniform stride (≤4 frames
    * kept), and every sampled frame gets its byte extent (offset, size)
    * inside the blob — exactly the plumbing a real decoder consumes
    * (seek + bounded read per frame), with the decode itself stubbed as
    * everywhere in this repo. Per-row explode of a ≤8-element sequence;
    * all integer div/mod arithmetic, no shuffle before the final sort.
    * At 100 TB this is the map stage ahead of a mapPartitions decoder —
    * the frame table (not the blobs) is what downstream joins touch. */
  def qMultimodalFrames(s: SparkSession, sf: String): DataFrame =
    Multimodal.mediaTable(s, sf)
      .withColumn("byte_len", length(col("media")))
      .withColumn("n_frames", (lit(1) + col("byte_len") % 8))
      .withColumn("stride", greatest(lit(1), expr("(n_frames + 3) div 4")))
      .select(col("doc_id"), col("n_frames"), col("byte_len"), col("stride"),
        explode(expr("sequence(0, n_frames - 1, stride)")).as("frame_idx"))
      .withColumn("frame_bytes", expr("byte_len div n_frames"))
      .withColumn("byte_offset", col("frame_idx") * col("frame_bytes"))
      .select("doc_id", "frame_idx", "byte_offset", "frame_bytes")
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> qMultimodalMeta _,
    "q_multimodal_decode" -> qMultimodalDecode _,
    "q_multimodal_frames" -> qMultimodalFrames _,
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |         1 + CAST(octet_length(encode(text)) AS INT) % 8 AS n_frames
        |  FROM documents),
        |s AS (SELECT *, greatest(1, (n_frames + 3) // 4) AS stride FROM m),
        |f AS (SELECT doc_id, n_frames, byte_len,
        |             CAST(unnest(range(0, n_frames, stride)) AS INT) AS frame_idx
        |      FROM s)
        |SELECT doc_id, frame_idx,
        |       CAST(frame_idx * (byte_len // n_frames) AS BIGINT) AS byte_offset,
        |       CAST(byte_len // n_frames AS BIGINT) AS frame_bytes
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_multimodal_meta" ->
      """WITH m AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS INT) AS byte_len FROM documents)
        |SELECT doc_id, byte_len, sha256(text) AS content_sha,
        |       64 + byte_len % 512 AS width,
        |       64 + (byte_len * 7) % 512 AS height,
        |       1 + byte_len % 8 AS n_frames
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
