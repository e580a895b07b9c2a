package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder mandate): treat media as opaque
  * `binary` columns with typed metadata, with the decode step STUBBED —
  * this container has no image/audio codecs, so the "decode" is a
  * deterministic fake over the bytes. Everything around the stub (schema,
  * Encoders, partition-wise batching, the binary column flowing through a
  * join) is real Spark and is what matters at 100 TB: decode work is
  * per-partition, no shuffle, codec libraries loaded once per partition
  * iterator (the Scala analogue of mapInPandas batching).
  */
object Multimodal {

  /** Typed metadata a real decoder would emit. */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int, n_frames: Int)

  /** DECODE STUB — deterministic fake standing in for an image/video
    * decoder (no codec libs in this environment). A real implementation
    * replaces ONLY the body: parse `bytes`, return actual dimensions.
    * The fake derives dims from byte length so tests can cross-validate
    * against pure-SQL arithmetic. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    MediaMeta(docId, n, 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 8)
  }

  /** Partition-wise decode over a (doc_id, media binary) frame: the
    * mapPartitions boundary is where a codec would be initialized once
    * per partition and reused across its rows. */
  def decodeAll(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Documents with a synthesized opaque binary column (UTF-8 bytes of the
    * text — the testdata has no real media; the column TYPE and flow are
    * the exercise). */
  def mediaTable(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"), encode(col("text"), "UTF-8").as("media"))
}
