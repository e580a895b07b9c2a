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

  /** Storage-level blob dedup estimate: fixed 64-BYTE chunking of every
    * media blob, duplicate-chunk mass per source — the content-addressed-
    * store sizing read (how much of this corpus's media bytes dedup away),
    * run on the OPAQUE binary column (Spark substring over BinaryType —
    * no decode). Shared prefixes across near-dup docs make the signal
    * non-vacuous at every SF. One explode + two partial-agg rollups; the
    * chunk groupBy shuffles 64-byte keys, linear in corpus bytes. The
    * oracle chunks the hex image of the blob (2 chars per byte — a
    * bijection, since DuckDB substring cannot take a BLOB), 128 hex chars
    * ≡ 64 bytes, so the counts must agree exactly. */
  def qMediaChunkDedup(s: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(s, sf)
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("media"))
    // empty-blob guard: Spark's (len-1) div 64 truncates toward zero
    // (-1 div 64 = 0 → one empty chunk) while DuckDB's // floors to -1
    // (zero chunks) — an empty blob would silently diverge the engines,
    // so neither side chunks it (it still counts in the blob rollup)
    val chunks = d
      .filter(length(col("media")) > 0)
      .select(col("source"), col("media"),
        explode(expr("sequence(0, (length(media) - 1) div 64)")).as("i"))
      .select(col("source"), expr("substring(media, i * 64 + 1, 64)").as("chunk"))
    val blobs = d.groupBy("source").agg(
      count(lit(1)).as("n_blobs"),
      sum(length(col("media"))).cast("bigint").as("total_bytes"))
    chunks.groupBy("source")
      .agg(count(lit(1)).as("n_chunks"), countDistinct("chunk").as("n_distinct_chunks"))
      .join(broadcast(blobs), Seq("source"))
      .withColumn("dup_chunk_rate",
        expr("CAST(n_chunks - n_distinct_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE)"))
      .select("source", "n_blobs", "total_bytes", "n_chunks",
        "n_distinct_chunks", "dup_chunk_rate")
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> qMultimodalMeta _,
    "q_multimodal_decode" -> qMultimodalDecode _,
    "q_multimodal_frames" -> qMultimodalFrames _,
    "q_media_chunk_dedup" -> qMediaChunkDedup _,
  )

  val oracle: Map[String, String] = Map(
    "q_media_chunk_dedup" ->
      """WITH d AS (SELECT doc_id, source, encode(text) AS media FROM documents),
        |ch AS (SELECT source,
        |              substring(hex(media), CAST(i * 128 + 1 AS BIGINT), 128) AS chunk
        |       FROM d, UNNEST(range(0, (octet_length(media) - 1) // 64 + 1)) AS u(i)
        |       WHERE octet_length(media) > 0),
        |a AS (SELECT source, count(*) AS n_chunks,
        |             count(DISTINCT chunk) AS n_distinct_chunks
        |      FROM ch GROUP BY 1),
        |b AS (SELECT source, count(*) AS n_blobs,
        |             CAST(sum(octet_length(media)) AS BIGINT) AS total_bytes
        |      FROM d GROUP BY 1)
        |SELECT source, n_blobs, total_bytes, n_chunks, n_distinct_chunks,
        |       CAST(n_chunks - n_distinct_chunks AS DOUBLE) /
        |       CAST(n_chunks AS DOUBLE) AS dup_chunk_rate
        |FROM a JOIN b USING (source) ORDER BY source""".stripMargin,
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
