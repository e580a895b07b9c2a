package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 user-behavior analytics over the events stream twin: cohort
  * retention, event-transition (Markov) counts, and activity streaks
  * (gaps-and-islands). All outputs are integer counts / dates, so
  * cross-engine hash equality needs no float machinery.
  *
  * Scale notes (100 TB): every query here repartitions once on `user_id`
  * and rides that single partitioning through its per-user window AND the
  * per-user pre-aggregation (HashPartitioning(user_id) satisfies the
  * ClusteredDistribution of any groupBy whose keys include user_id), then
  * pays one final small shuffle on the coarse output key. No windows
  * without a partition key; no driver-side state.
  */
object Behavior {

  /** Per-user activity days, deduplicated, partitioned by user: the shared
    * first stage of retention and streaks. One shuffle; the downstream
    * user-partitioned window reuses the same distribution. */
  private def userDays(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .repartition(col("user_id"))
      .groupBy("user_id", "day").agg(count(lit(1)).as("_n"))
      .drop("_n")

  /** Classic cohort retention: users are cohorted by their first active
    * day; each later active day counts them as retained at that day
    * offset. The (cohort_day, day_offset) matrix is THE product-analytics
    * warhorse. count(*) is exact distinct users because the user-day frame
    * is already deduplicated and a user has exactly one cohort. */
  def qRetention(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    userDays(s, sf)
      .withColumn("cohort_day", min("day").over(w))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Event-type transition counts (the first-order Markov matrix over user
    * journeys): for each consecutive event pair per user, count
    * (event_type → next_type). Ordering ties on ts are broken by event_id
    * for a deterministic sequence on both engines. */
  def qEventTransitions(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, sf)
      .repartition(col("user_id"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "next_type")
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands pattern: day_number - row_number is constant within
    * a run of consecutive days, so grouping on it splits runs without a
    * self-join. Output per user: active days, number of streaks, longest
    * streak. */
  def qWinStreaks(s: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("day").asc)
    val islands = userDays(s, sf)
      .withColumn("grp",
        datediff(col("day"), lit("2024-01-01").cast("date")) - row_number().over(w))
    val streaks = islands.groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
    streaks.groupBy("user_id")
      .agg(sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("max_streak"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention" -> qRetention _,
    "q_event_transitions" -> qEventTransitions _,
    "q_win_streaks" -> qWinStreaks _,
  )

  val oracle: Map[String, String] = Map(
    "q_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM ud)
        |SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
        |       count(*) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q_event_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, count(*) AS n
        |FROM t WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, next_type""".stripMargin,
    "q_win_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |i AS (SELECT user_id, day,
        |             date_diff('day', DATE '2024-01-01', day)
        |               - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM ud),
        |s AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days, count(*) AS n_streaks,
        |       max(len) AS max_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
