package graft.queries

import graft.{Pipeline, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch twins of the streaming pipeline (SURVEY.md §2 B.9).
  *
  * The reference's whole dataflow is keyed windowed counting over a stream
  * (SURVEY.md §2 Part A, A4-A6 — reconstructed; /root/reference is empty).
  * Streaming output can't be DuckDB-hash-matched, so each capability has a
  * batch twin here that calls the SAME transform in [[graft.Pipeline]] the
  * streaming tests use — single definition, two callers. The scalatest
  * suite runs the MemoryStream flavor with watermarks and the exactly-once
  * restart protocol.
  */
object StreamTwins {

  def qStreamTumbling(s: SparkSession, sf: String): DataFrame =
    Pipeline.tumblingCounts(Tables.events(s, sf))
      .orderBy("win_start", "event_type")

  def qStreamSliding(s: SparkSession, sf: String): DataFrame =
    Pipeline.slidingCounts(Tables.events(s, sf))
      .orderBy("win_start", "event_type")

  def qStreamSession(s: SparkSession, sf: String): DataFrame =
    Pipeline.sessionCounts(Tables.events(s, sf))
      .orderBy("user_id", "sess_start")

  def qStreamDedup(s: SparkSession, sf: String): DataFrame =
    Pipeline.dedupEvents(Tables.events(s, sf))
      .select("event_id", "user_id", "event_type", "ts", "value")
      .orderBy("event_id")

  def qStreamEnrich(s: SparkSession, sf: String): DataFrame =
    Pipeline.enrichedCounts(Tables.events(s, sf), Tables.nation(s, sf))
      .orderBy("win_start", "n_name")

  def qStreamJoin(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Pipeline.clicksWithin(Tables.events(s, sf))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("v_ts")).as("n_matched_views"))
      .orderBy("user_id")
  }

  def qStreamOuterJoin(s: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Pipeline.viewOutcomes(Tables.events(s, sf))
      .groupBy("user_id")
      .agg(
        countDistinct(when(col("c_ts").isNotNull, col("v_ts")))
          .as("converted_views"),
        countDistinct(when(col("c_ts").isNull, col("v_ts")))
          .as("lost_views"),
        count(col("c_ts")).as("n_pairs"))
      .orderBy("user_id")
  }

  def qStreamJoinAgg(s: SparkSession, sf: String): DataFrame =
    Pipeline.attributedHourlyCounts(Tables.events(s, sf))
      .orderBy("win_start")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_join_agg" -> qStreamJoinAgg _,
    "q_stream_outer_join" -> qStreamOuterJoin _,
    "q_stream_tumbling" -> qStreamTumbling _,
    "q_stream_sliding" -> qStreamSliding _,
    "q_stream_session" -> qStreamSession _,
    "q_stream_dedup" -> qStreamDedup _,
    "q_stream_enrich" -> qStreamEnrich _,
    "q_stream_join" -> qStreamJoin _,
  )

  // DuckDB reads events.ts (parquet timestamp[ns]) truncated to µs — same
  // values Spark sees after Tables.events' nanos->micros conversion.
  // time_bucket's default origin (2000-01-01) is 10-min-aligned to the
  // epoch, matching Spark window()'s epoch alignment.
  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      s"""SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS win_start,
         |       time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS win_end,
         |       event_type, count(*) AS cnt, ${Det.sumDec2("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3 ORDER BY win_start, event_type""".stripMargin,
    "q_stream_sliding" ->
      """SELECT win_start, win_start + INTERVAL 30 MINUTE AS win_end, event_type, count(*) AS cnt
        |FROM (
        |  SELECT time_bucket(INTERVAL 10 MINUTE, ts) - k * INTERVAL 10 MINUTE AS win_start, event_type
        |  FROM events CROSS JOIN (VALUES (0), (1), (2)) AS t(k))
        |GROUP BY 1, 2, 3 ORDER BY win_start, event_type""".stripMargin,
    "q_stream_session" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), numbered AS (
         |  SELECT user_id, ts, value,
         |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked)
         |SELECT min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
         |       user_id, count(*) AS cnt, ${Det.sumDec2("value")} AS sum_value
         |FROM numbered GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
    "q_stream_dedup" ->
      """SELECT event_id, user_id, event_type, ts, value FROM events ORDER BY event_id""".stripMargin,
    "q_stream_join_agg" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, v.ts) AS win_start,
        |       time_bucket(INTERVAL 1 HOUR, v.ts) + INTERVAL 1 HOUR AS win_end,
        |       count(*) AS n_pairs
        |FROM events v JOIN events c
        |  ON c.user_id = v.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
        |GROUP BY 1, 2 ORDER BY win_start""".stripMargin,
    "q_stream_outer_join" ->
      """SELECT v.user_id,
        |       count(DISTINCT CASE WHEN c.ts IS NOT NULL THEN v.ts END) AS converted_views,
        |       count(DISTINCT CASE WHEN c.ts IS NULL THEN v.ts END) AS lost_views,
        |       count(c.ts) AS n_pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON c.user_id = v.user_id
        | AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,
    "q_stream_join" ->
      """SELECT v.user_id, count(*) AS n_pairs, count(DISTINCT v.ts) AS n_matched_views
        |FROM events v JOIN events c
        |  ON c.user_id = v.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,
    "q_stream_enrich" ->
      s"""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
         |       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS win_end,
         |       n_name, count(*) AS cnt, ${Det.sumDec2("value")} AS sum_value
         |FROM events JOIN nation ON user_id % 25 = n_nationkey
         |GROUP BY 1, 2, 3 ORDER BY win_start, n_name""".stripMargin,
  )
}
