package graft

import graft.streaming.Sources
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.nio.file.Files

case class Imp(ad_id: Long, ts: Timestamp)
case class Clk(ad_id: Long, ts: Timestamp)
case class EvU(ts: Timestamp, user_id: Long, value: Double)
case class EvT(ts: Timestamp, user_id: Long, event_type: String)

/** Further streaming coverage: stream-stream interval join, RocksDB state
  * store provider, file-based source via the source-agnostic factory. */
class StreamingMoreSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join (clicks within 10m after impression)") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val i = imps.toDF().withWatermark("ts", "30 minutes")
      .select(col("ad_id").as("i_ad"), col("ts").as("i_ts"))
    val c = clks.toDF().withWatermark("ts", "30 minutes")
      .select(col("ad_id").as("c_ad"), col("ts").as("c_ts"))
    val joined = i.join(c,
      col("i_ad") === col("c_ad") &&
        col("c_ts") >= col("i_ts") &&
        col("c_ts") <= col("i_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    try {
      imps.addData(Imp(1, ts("2024-01-01 10:00:00")), Imp(2, ts("2024-01-01 10:00:00")))
      clks.addData(
        Clk(1, ts("2024-01-01 10:05:00")), // within window -> joins
        Clk(2, ts("2024-01-01 10:20:00"))) // 20m later -> outside window
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ss_join_out").select("i_ad").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), "only the click within 10 minutes joins")
  }

  test("stream-stream LEFT OUTER interval join: lost view emits once, after the watermark") {
    // The semantically sharp outer-join case: a view with no click inside
    // its 10-minute window may emit its null row only once the watermark
    // has passed the window's upper bound (earlier, a matching click could
    // still arrive) — and must emit it exactly once.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvT]
    val q = Pipeline.viewOutcomes(
        mem.toDF().withColumn("value", lit(0.0)))
      .writeStream.outputMode("append")
      .format("memory").queryName("outer_join_out").start()
    try {
      mem.addData(
        EvT(ts("2024-01-01 10:00:00"), 7L, "view"),  // converts at 10:05
        EvT(ts("2024-01-01 10:05:00"), 7L, "click"),
        EvT(ts("2024-01-01 10:02:00"), 8L, "view"))  // never converts
      q.processAllAvailable()
      val early = spark.table("outer_join_out").collect()
      assert(early.map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toSet ==
        Set((7L, Some(ts("2024-01-01 10:05:00")))),
        "the match emits immediately; the lost view must still be held " +
          s"(watermark hasn't passed its window): ${early.mkString(",")}")
      // two more batches, each advancing BOTH event-time branches (the
      // global watermark is the MIN of the view-side and click-side
      // watermarks — advancing only one side holds it back forever): the
      // first moves the watermark past 10:02 + 10 min window + 30 min
      // delay, the second gives the join the post-advance batch it needs
      // to flush the evicted view. The sentinel clicks (users 90/91)
      // can never surface — the right side of a left join emits only on
      // a match. Sentinel view 9 (12:00) also closes once the 14:00
      // batch's finalization round runs at watermark 13:30 > 12:40;
      // view 10 (14:00) stays inside its own horizon.
      mem.addData(EvT(ts("2024-01-01 12:00:00"), 9L, "view"),
        EvT(ts("2024-01-01 12:00:00"), 90L, "click"))
      q.processAllAvailable()
      mem.addData(EvT(ts("2024-01-01 14:00:00"), 10L, "view"),
        EvT(ts("2024-01-01 14:00:00"), 91L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("outer_join_out").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.getTimestamp(2))))
    val lost = out.filter(_._3.isEmpty).sortBy(_._1).toSeq
    assert(lost == Seq(
        (8L, Some(ts("2024-01-01 10:02:00")), None),
        (9L, Some(ts("2024-01-01 12:00:00")), None)),
      s"each lost view must emit with a null click exactly once: ${out.mkString(",")}")
    assert(!out.exists(r => Seq(10L, 90L, 91L).contains(r._1)),
      "views still inside the watermark horizon (and unmatched clicks) " +
        "must NOT have emitted")
  }

  test("outer-join twin: streaming viewOutcomes matches its batch flavor when closed") {
    // On a stream whose watermark has passed every view's join window,
    // streaming viewOutcomes emits exactly the batch result over the same
    // rows (minus the horizon-advancing sentinel, filtered out here).
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EvT(ts("2024-01-01 10:00:00"), 1L, "view"),
      EvT(ts("2024-01-01 10:03:00"), 1L, "click"),
      EvT(ts("2024-01-01 10:06:00"), 1L, "click"), // 2 clicks, 1 view
      EvT(ts("2024-01-01 10:01:00"), 2L, "view"),  // lost
      EvT(ts("2024-01-01 10:30:00"), 2L, "click")) // outside 2's window
    val mem = MemoryStream[EvT]
    val toDf = (df: org.apache.spark.sql.DataFrame) =>
      Pipeline.viewOutcomes(df.withColumn("value", lit(0.0)))
    val q = toDf(mem.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("outer_twin_out").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // sentinel PAIRS: both event-time branches must advance (global
      // watermark = min of the two sides); the sentinel views stay inside
      // their own horizon and are filtered from the comparison
      mem.addData(EvT(ts("2024-01-02 00:00:00"), 99L, "view"),
        EvT(ts("2024-01-02 00:00:00"), 99L, "click")) // advance
      q.processAllAvailable()
      mem.addData(EvT(ts("2024-01-03 00:00:00"), 99L, "view"),
        EvT(ts("2024-01-03 00:00:00"), 99L, "click")) // flush
      q.processAllAvailable()
    } finally q.stop()
    def canon(rows: Seq[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2))))
      .filter(_._1 != 99L)
      .sortBy(r => (r._1, r._2.getTime, r._3.map(_.getTime).getOrElse(0L)))
    val streamed = canon(spark.table("outer_twin_out").collect().toSeq)
    val batch = canon(toDf(data.toDF()).collect().toSeq)
    assert(streamed == batch,
      s"streaming $streamed must equal batch $batch on the closed stream")
    assert(batch.count(_._3.isEmpty) == 1, "exactly one lost view planted")
  }

  test("chained stateful operators: interval join feeding a windowed agg in ONE query") {
    // Two stateful operators in a single streaming plan (join state +
    // window state): the window may only emit once the PROPAGATED
    // watermark — delayed by the join's own output lateness — passes its
    // end. Closed-stream result must equal the batch flavor.
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EvT(ts("2024-01-01 10:00:00"), 1L, "view"),
      EvT(ts("2024-01-01 10:03:00"), 1L, "click"),  // pair in hour 10
      EvT(ts("2024-01-01 10:40:00"), 2L, "view"),
      EvT(ts("2024-01-01 10:45:00"), 2L, "click"),  // pair in hour 10
      EvT(ts("2024-01-01 11:20:00"), 3L, "view"),
      EvT(ts("2024-01-01 11:25:00"), 3L, "click"),  // pair in hour 11
      EvT(ts("2024-01-01 11:30:00"), 4L, "view"))   // lost: no pair
    val mem = MemoryStream[EvT]
    val toDf = (df: org.apache.spark.sql.DataFrame) =>
      Pipeline.attributedHourlyCounts(df.withColumn("value", lit(0.0)))
    val q = toDf(mem.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("join_agg_out").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // close both hours: advance BOTH event-time branches far enough
      // that the propagated watermark passes 12:00
      mem.addData(EvT(ts("2024-01-02 00:00:00"), 99L, "view"),
        EvT(ts("2024-01-02 00:00:00"), 99L, "click"))
      q.processAllAvailable()
      mem.addData(EvT(ts("2024-01-03 00:00:00"), 99L, "view"),
        EvT(ts("2024-01-03 00:00:00"), 99L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("join_agg_out").collect()
      .map(r => (r.getTimestamp(0), r.getLong(2))).sortBy(_._1.getTime).toSeq
    assert(streamed == Seq(
        (ts("2024-01-01 10:00:00"), 2L), (ts("2024-01-01 11:00:00"), 1L)),
      s"closed hourly conversion counts: $streamed")
    val batch = toDf(data.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getLong(2))).sortBy(_._1.getTime).toSeq
    assert(streamed == batch, s"streaming $streamed must equal batch $batch")
  }

  test("stream-static broadcast enrichment join (dimension lookup per micro-batch)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("ad_id", "tier")
    val imps = MemoryStream[Imp]
    // static side broadcast: each micro-batch hash-joins against the dim
    // in-task — no stream-side shuffle, no state store; the standard
    // pipeline enrichment shape (stream ⨝ slowly-changing dimension)
    val enriched = imps.toDF().join(broadcast(dim), Seq("ad_id"), "left")
      .select(col("ad_id"), coalesce(col("tier"), lit("unknown")).as("tier"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      imps.addData(Imp(1, ts("2024-01-01 10:00:00")),
        Imp(2, ts("2024-01-01 10:01:00")), Imp(3, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enrich_out").orderBy("ad_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "gold"), (2L, "silver"), (3L, "unknown")))
  }

  test("interval-join twin: streaming clicksWithin matches its batch flavor") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EvT(ts("2024-01-01 10:00:00"), 1L, "view"),
      EvT(ts("2024-01-01 10:05:00"), 1L, "click"), // within 10m -> joins
      EvT(ts("2024-01-01 10:20:00"), 1L, "click"), // outside 10m
      EvT(ts("2024-01-01 10:00:00"), 2L, "view"), // view with no click
      EvT(ts("2024-01-01 10:03:00"), 3L, "click")) // click with no view
    val mem = MemoryStream[EvT]
    val q = Pipeline.clicksWithin(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("cw_out").start()
    try { mem.addData(data: _*); q.processAllAvailable() } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "v_ts", "c_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSeq
    val streamed = canon(spark.table("cw_out"))
    assert(streamed == canon(Pipeline.clicksWithin(data.toDF())),
      "stream and batch interval joins must agree")
    assert(streamed ==
      Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))))
  }

  test("stream-static enrichment + windowed rollup matches its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val nation = Tables.nation(spark, sf001)
    val data = Seq(
      EvU(ts("2024-01-01 00:05:00"), 1L, 10.0),
      EvU(ts("2024-01-01 00:15:00"), 26L, 5.0), // 26 % 25 = 1: same nation as user 1
      EvU(ts("2024-01-01 00:20:00"), 2L, 7.5),
      EvU(ts("2024-01-01 01:05:00"), 1L, 2.5)) // second window
    val mem = MemoryStream[EvU]
    val q = Pipeline.enrichedCounts(mem.toDF(), nation)
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_twin_out").start()
    try { mem.addData(data: _*); q.processAllAvailable() } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("win_start", "n_name").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
          r.getLong(3), r.getDouble(4))).toSeq
    val streamed = canon(spark.table("enrich_twin_out"))
    val batch = canon(Pipeline.enrichedCounts(data.toDF(), nation))
    assert(streamed == batch, "stream and batch enrichment rollups must agree")
    assert(streamed.map(_._4).sum == data.size, "every event lands in exactly one window")
  }

  test("streaming aggregation runs on the RocksDB state store provider") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val cp = Files.createTempDirectory("rocks_cp").toString
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Pipeline.tumblingCounts(mem.toDF())
      .writeStream.outputMode("complete")
      .option("checkpointLocation", cp)
      .format("memory").queryName("rocks_out").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 00:01:00"), "click", 1.0),
        Ev(ts("2024-01-01 00:02:00"), "click", 2.0))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val rows = spark.table("rocks_out").collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 2L)
  }

  test("file-based source through the source-agnostic factory") {
    val dir = Files.createTempDirectory("filestream").toString
    val schema = Tables.events(spark, sf001).schema
    // stage one batch of files
    Tables.events(spark, sf001).limit(100).write.mode("overwrite").parquet(dir)
    val q = Pipeline.tumblingCounts(Sources.fileStream(spark, dir, schema))
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("file_out")
      .agg(sum("cnt")).collect().head.getLong(0)
    assert(streamed == 100L)
  }
}
