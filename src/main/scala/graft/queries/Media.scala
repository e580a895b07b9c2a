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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> qMultimodalMeta _,
    "q_multimodal_decode" -> qMultimodalDecode _,
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """WITH m AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS INT) AS byte_len FROM documents)
        |SELECT doc_id, byte_len, sha256(text) AS content_sha,
        |       64 + byte_len % 512 AS width,
        |       64 + (byte_len * 7) % 512 AS height,
        |       1 + byte_len % 8 AS n_frames
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
