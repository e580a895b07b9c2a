package graft

import graft.queries.Det
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Custom keyed state, salting, and partitioned-layout evidence. */
class StatefulSpec extends SparkSuite {
  import spark.implicits._

  test("flatMapGroupsWithState keeps per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = Pipeline.runningTotalsStateful(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("state_out").start()
    try {
      mem.addData(UserEvent(1, 10.0), UserEvent(1, 5.0), UserEvent(2, 1.0))
      q.processAllAvailable()
      mem.addData(UserEvent(1, 2.0)) // state must carry cnt=2, sum=15
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("state_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, 3L, 17.0)), s"state lost across batches: $rows")
    assert(rows.contains((2L, 1L, 1.0)))
  }

  test("transformWithState keeps ValueState across micro-batches (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val cp = Files.createTempDirectory("tws_cp").toString
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Pipeline.runningTotalsTws(mem.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation", cp)
      .format("memory").queryName("tws_out").start()
    try {
      mem.addData(UserEvent(1, 10.0), UserEvent(1, 5.0), UserEvent(2, 1.0))
      q.processAllAvailable()
      mem.addData(UserEvent(1, 2.0)) // ValueState must carry cnt=2, sum=15
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val rows = spark.table("tws_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, 3L, 17.0)), s"ValueState lost across batches: $rows")
    assert(rows.contains((2L, 1L, 1.0)))
  }

  test("transformWithState event-time TIMER closes a quiet session (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SessEvent]
    val cp = Files.createTempDirectory("timer_cp").toString
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Pipeline.sessionTimeoutTws(mem.toDS(), gapMs = 5 * 60 * 1000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("memory").queryName("timer_out").start()
    try {
      // user 1's session: two events, 10:00 and 10:02 -> timer at 10:07.
      // processAllAvailable also runs the no-data batch that advances the
      // watermark to 10:02 - 1 min = 10:01 < 10:07: nothing may fire yet
      mem.addData(
        SessEvent(1L, t("2024-01-01 10:00:00"), 1.0),
        SessEvent(1L, t("2024-01-01 10:02:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("timer_out").isEmpty,
        "no session may close before the watermark passes its timer")
      // user 2 opens at 10:30: the trailing no-data batch lifts the
      // watermark to 10:29 >= 10:07 -> user 1's timer fires; user 2's
      // (10:35) must NOT
      mem.addData(SessEvent(2L, t("2024-01-01 10:30:00"), 9.0))
      q.processAllAvailable()
      val afterFire = spark.table("timer_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(afterFire == Set((1L, 2L, 3.0)),
        s"exactly user 1's 2-event session must close, got $afterFire")
      // a RE-OPENED session for user 1 (timer 11:05); the watermark rises
      // to 10:59, which also fires user 2's quiet session (10:35)
      mem.addData(SessEvent(1L, t("2024-01-01 11:00:00"), 7.0))
      q.processAllAvailable()
      val afterReopen = spark.table("timer_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(afterReopen == Set((1L, 2L, 3.0), (2L, 1L, 9.0)),
        s"user 2's quiet session must close, user 1's re-opened one must not: $afterReopen")
      // advance the watermark past 11:05: the re-opened session closes
      // ONCE — the first timer cleared with the first session's state
      mem.addData(SessEvent(4L, t("2024-01-01 11:30:00"), 0.0))
      q.processAllAvailable()
      val end = spark.table("timer_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(end == Set((1L, 2L, 3.0), (2L, 1L, 9.0), (1L, 1L, 7.0)),
        s"the re-opened session must close exactly once: $end")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("session-timeout processor stretches start_ms for an out-of-order cross-batch event") {
    // the round-12 ADVICE seam: an event in a LATER batch that is OLDER
    // than the open session's start (but within watermark and gap) merges
    // into the session — its start_ms must move DOWN to the earliest
    // event, never stay at the first-seen one
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SessEvent]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Pipeline.sessionTimeoutTws(mem.toDS(), gapMs = 5 * 60 * 1000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sess_ooo_cp").toString)
      .format("memory").queryName("sess_ooo_out").start()
    try {
      mem.addData(SessEvent(1L, t("2024-01-01 10:10:00"), 1.0))
      q.processAllAvailable() // watermark trails at ~10:09
      // older than the open session's start, within watermark AND gap
      mem.addData(SessEvent(1L, t("2024-01-01 10:09:30"), 2.0))
      q.processAllAvailable()
      // advance the watermark past the session's 10:15 timer to close it
      mem.addData(SessEvent(9L, t("2024-01-01 10:30:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_ooo_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
        .filter(_._1 == 1L).toSeq
      assert(got == Seq((1L, 2L, 3.0,
        t("2024-01-01 10:09:30").getTime, t("2024-01-01 10:10:00").getTime)),
        s"start_ms must stretch down to the out-of-order event: $got")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("session-timeout processor splits an over-gap run inside one batch") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SessEvent]
    // transformWithState needs the multi-column-family store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Pipeline.sessionTimeoutTws(mem.toDS(), gapMs = 5 * 60 * 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("timer_split_out").start()
    try {
      // both events in ONE batch, 20 min apart: the first session must
      // close INLINE (no timer can fire between rows of a batch)
      mem.addData(
        SessEvent(9L, t("2024-01-01 10:00:00"), 1.0),
        SessEvent(9L, t("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      val got = spark.table("timer_split_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((9L, 1L, 1.0)),
        s"the over-gap run must split inline, got $got")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("salted two-phase aggregation is bit-equal to direct aggregation") {
    val ev = Tables.events(spark, sf001)
    val direct = ev.groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("cnt"), expr(Det.sumDec2("value")).as("sum_value"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val salted = Scale.saltedCountSum(ev, col("user_id"), "CAST(value AS DECIMAL(18,2))", 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == direct)
  }

  test("partitioned parquet layout: filters prune partitions at scan") {
    val dir = Files.createTempDirectory("part_layout").toString
    Tables.events(spark, sf001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = scan.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), not as
    // a data filter evaluated per row
    assert(plan.contains("PartitionFilters") && plan.contains("click"),
      s"expected 'click' in PartitionFilters; plan:\n$plan")
    assert(scan.count() ==
      Tables.events(spark, sf001).filter(col("event_type") === "click").count())
  }
}
