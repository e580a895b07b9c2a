package graft.queries

import graft.{Multimodal, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column queries (builder mandate; see [[graft.Multimodal]]). */
object Media {

  /** Binary metadata via pure SQL arithmetic (oracled): byte length, sha256
    * fingerprint, fake decoded dims — the binary column flows through the
    * plan as an opaque value. */
  def qMultimodalMeta(s: SparkSession, sf: String): DataFrame =
    Multimodal.mediaTable(s, sf)
      .select(
        col("doc_id"),
        length(col("media")).as("byte_len"),
        sha2(col("media"), 256).as("content_sha"),
        (lit(64) + col("n_chars") % 512).as("width"),
        (lit(64) + (col("n_chars") * 7) % 512).as("height"),
        (lit(1) + col("n_chars") % 8).as("n_frames"))
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
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |       sha256(text) AS content_sha,
        |       64 + n_chars % 512 AS width,
        |       64 + (n_chars * 7) % 512 AS height,
        |       1 + n_chars % 8 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
