package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-agnostic stream transforms — the reference's core dataflow
  * (Kafka -> parse -> keyBy -> tumbling window -> count/sum -> sink),
  * re-expressed as pure DataFrame -> DataFrame functions.
  *
  * The reference (liyue2008/kafka-flink-exactlyonce-example, reconstructed
  * in SURVEY.md §2 Part A — /root/reference is empty, see SURVEY.md §0)
  * keys a Kafka string stream and maintains per-key windowed counts with
  * exactly-once delivery. Here the SAME function body serves:
  *   - the batch twins in `SparkEntry.queries` (DuckDB-oracled), and
  *   - Structured Streaming flavors in the scalatest suite
  *     (MemoryStream -> transform -> sink, with watermarks).
  * One definition, two callers: this is what makes the streaming semantics
  * testable against a batch oracle.
  *
  * Scale notes (100 TB): every transform is a keyed hash aggregation —
  * Spark plans partial (map-side) + final agg, shuffling only compacted
  * partial state on (window, key). Streaming state is bounded by the
  * watermark; RocksDB state store handles >memory key spaces.
  */
object Pipeline {

  /** A4-A6 flagship: per-key count+sum over 10-minute tumbling windows. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        expr(graft.queries.Det.sumDec2("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding window: 30-minute window sliding every 10 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("cnt"))

  /** Session windows per user, 30-minute inactivity gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        expr(graft.queries.Det.sumDec2("value")).as("sum_value"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("cnt"), col("sum_value"))

  /** Dedup by event_id (streaming flavor: dropDuplicatesWithinWatermark). */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Stream-stream interval join, source-agnostic: every (view, click)
    * pair for the same user with the click in (view_ts, view_ts + 10 min].
    * The watermarks bound join state in the streaming flavor (rows older
    * than 30 min are evictable on both sides — without them the state
    * store grows forever); in batch they are no-ops. The join itself is an
    * equi-join on user_id with a range residual — shuffle on user only,
    * never a time-cross-product. */
  def clicksWithin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "30 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    views.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") > col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      .select("user_id", "v_ts", "c_ts")
  }

  /** LEFT OUTER flavor of [[clicksWithin]]: every view paired with its
    * clicks in (v_ts, v_ts + 10 min], and views with NO such click kept
    * with a null c_ts — the attribution join that also reports the lost
    * impressions. In the streaming flavor this is the semantically sharp
    * case: an unmatched view may only emit once the watermark has passed
    * its join window's upper bound (before that a matching click could
    * still arrive), so the null row appears exactly once, late, and the
    * state store holds the view exactly until then. In batch the
    * watermarks are no-ops and it is a plain left outer interval join —
    * same equi-join shuffle on user_id, range as residual. */
  def viewOutcomes(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "30 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    views.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") > col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select("user_id", "v_ts", "c_ts")
  }

  /** CHAINED stateful operators in one query: the [[clicksWithin]]
    * stream-stream interval join feeding a tumbling-window aggregation
    * of conversion pairs per hour — two stateful operators (join state +
    * window state) in a single streaming plan, the shape Spark supports
    * since 3.5 (SPARK-42376) and the reason watermarks PROPAGATE: the
    * window may only close once the join can emit nothing earlier than
    * it. In batch this is a plain join + agg; one definition serves
    * both. At scale: join shuffles on user_id, the window agg re-keys on
    * the hour bucket — two exchanges, both keyed, state bounded by the
    * watermark on both operators. */
  def attributedHourlyCounts(events: DataFrame): DataFrame =
    clicksWithin(events)
      .groupBy(window(col("v_ts"), "1 hour"))
      // plain count only: DISTINCT aggregates are unsupported in
      // streaming plans, and this definition must serve both flavors
      .agg(count(lit(1)).as("n_pairs"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_pairs"))

  /** Stream-static enrichment + windowed rollup: join each event to its
    * dimension row (user_id mod 25 keys the synthetic nation dim), then
    * count/sum per (1-hour window, dimension attribute). The dim is
    * broadcast: per micro-batch (or per task, in batch) the join is an
    * in-task hash lookup — the stream side never shuffles for the join,
    * only for the windowed agg. The standard Flink/Kafka "enrich then
    * aggregate" pipeline shape, one definition for both engines. */
  def enrichedCounts(events: DataFrame, nation: DataFrame): DataFrame =
    events
      .withColumn("nkey", col("user_id") % 25)
      .join(broadcast(nation.select(col("n_nationkey").as("nkey"), col("n_name"))), Seq("nkey"))
      .groupBy(window(col("ts"), "1 hour"), col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        expr(graft.queries.Det.sumDec2("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_name"), col("cnt"), col("sum_value"))

  /** Custom keyed state via flatMapGroupsWithState: per-user running count
    * + running sum emitted on every update (the reference's incremental
    * per-key aggregate, A6, expressed as explicit state instead of a
    * windowed agg — the escape hatch for state machines that windowed
    * aggregation can't express). State is one small case class per key;
    * at scale it lives in the (RocksDB-capable) state store. */
  def runningTotalsStateful(events: org.apache.spark.sql.Dataset[UserEvent])
    : org.apache.spark.sql.Dataset[UserRunningTotal] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunningTotal, UserRunningTotal](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunningTotal]) =>
          val prev = state.getOption.getOrElse(UserRunningTotal(userId, 0L, 0.0))
          var cnt = prev.cnt; var sum = prev.sum
          val out = rows.map { e =>
            cnt += 1; sum += e.value
            UserRunningTotal(userId, cnt, sum)
          }.toList
          if (out.nonEmpty) state.update(out.last)
          out.iterator
      }
  }

  /** The same per-key running aggregate on Spark 4's transformWithState
    * (StatefulProcessor) API — typed ValueState handles with explicit
    * TimeMode/TTL, the successor to flatMapGroupsWithState for new
    * pipelines. Requires the RocksDB state store provider. */
  def runningTotalsTws(events: org.apache.spark.sql.Dataset[UserEvent])
    : org.apache.spark.sql.Dataset[UserRunningTotal] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Timer-driven session timeout on transformWithState — the state-TIMER
    * side of the StatefulProcessor API (running totals above exercise only
    * ValueState). Each user's open session lives in one ValueState cell; an
    * EVENT-TIME timer at last_event + gap fires when the WATERMARK passes
    * it, closing the session — the canonical "emit the session when the
    * user goes quiet" shape that `session_window` aggregation cannot
    * express once the output needs custom per-session payloads. Events are
    * watermark-bounded, so state size is (open sessions) × O(1) and late
    * events beyond the watermark are dropped by the framework, exactly the
    * 100 TB posture of the other streaming operators. */
  def sessionTimeoutTws(events: org.apache.spark.sql.Dataset[SessEvent], gapMs: Long)
    : org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimeoutProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Input/output rows for the custom-state operator. */
case class UserEvent(user_id: Long, value: Double)
case class UserRunningTotal(user_id: Long, cnt: Long, sum: Double)

/** StatefulProcessor for [[Pipeline.runningTotalsTws]]: one ValueState
  * cell per user holding the running (cnt, sum); each micro-batch folds
  * its rows into the cell and emits the updated total. */
class RunningTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserRunningTotal] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[UserRunningTotal] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserRunningTotal](
      "totals", org.apache.spark.sql.Encoders.product[UserRunningTotal], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[UserRunningTotal] = {
    val prev = if (totals.exists()) totals.get() else UserRunningTotal(key, 0L, 0.0)
    var cnt = prev.cnt; var sum = prev.sum
    rows.foreach { e => cnt += 1; sum += e.value }
    val now = UserRunningTotal(key, cnt, sum)
    totals.update(now)
    Iterator.single(now)
  }
}

/** Input/output rows for the timer-based session-timeout operator. */
case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class ClosedSession(user_id: Long, n_events: Long, sum_value: Double,
    start_ms: Long, end_ms: Long)
/** Open-session state: epoch-ms bounds, running count/sum, and the
  * event-time timer currently registered for this key (so a session
  * extension can delete-and-re-register instead of leaking stale timers). */
case class OpenSession(start_ms: Long, last_ms: Long, n: Long, sum: Double,
    timer_ms: Long)

/** StatefulProcessor for [[Pipeline.sessionTimeoutTws]]: ValueState + an
  * event-time timer per key. A new event either extends the open session
  * (moving its timer forward) or — when it lands more than `gapMs` after
  * the last one — closes the old session INLINE and opens a new one; the
  * timer handles the "user went quiet" case the input alone never
  * surfaces. */
class SessionTimeoutProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessEvent, ClosedSession] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession](
      "open", org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

  private def closed(key: Long, s: OpenSession): ClosedSession =
    ClosedSession(key, s.n, s.sum, s.start_ms, s.last_ms)

  override def handleInputRows(
      key: Long,
      rows: Iterator[SessEvent],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    // process in event-time order: a micro-batch's rows arrive unordered
    val evs = rows.toArray.sortBy(e => (e.ts.getTime, e.value))
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = if (open.exists()) Option(open.get()) else None
    evs.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t <= s.last_ms + gapMs =>
          // a cross-batch out-of-order event (within watermark + gap) can
          // precede the open session's start — the session's bounds must
          // stretch BOTH ways, or start_ms can read later than its
          // earliest event
          cur = Some(s.copy(start_ms = math.min(s.start_ms, t),
            last_ms = math.max(s.last_ms, t), n = s.n + 1,
            sum = s.sum + e.value))
        case Some(s) => // gap exceeded inside the stream: close inline
          out += closed(key, s)
          cur = Some(OpenSession(t, t, 1L, e.value, s.timer_ms))
        case None =>
          cur = Some(OpenSession(t, t, 1L, e.value, -1L))
      }
    }
    cur.foreach { s =>
      val expiry = s.last_ms + gapMs
      if (s.timer_ms != expiry) {
        if (s.timer_ms >= 0) getHandle.deleteTimer(s.timer_ms)
        getHandle.registerTimer(expiry)
      }
      open.update(s.copy(timer_ms = expiry))
    }
    out.iterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    // guard against a stale timer surviving a delete/re-register race: only
    // the timer the state currently owns may close the session
    if (open.exists() && open.get().timer_ms == expiredTimerInfo.getExpiryTimeInMs) {
      val s = open.get()
      open.clear()
      Iterator.single(closed(key, s))
    } else Iterator.empty
  }
}
