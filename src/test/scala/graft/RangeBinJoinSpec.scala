package graft

import graft.plans.RangeBinJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The custom-optimizer-rule exhibit ([[graft.plans.RangeBinJoinRule]]):
  * a declarative BETWEEN join must stop planning as a nested loop once
  * the rule is active, and must return EXACTLY the nested-loop results —
  * including the boundary, empty-interval, and NULL-bound edges the
  * rewrite argues about in its scaladoc. */
class RangeBinJoinSpec extends SparkSuite {
  import spark.implicits._

  // collect-and-recreate breaks the common-lineage ambiguity (both frames
  // derive from events); sizes are fixture-small (1k pts, 150 intervals)
  private lazy val points: DataFrame =
    Tables.events(spark, sf001)
      .select(col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("event_id", "sec")
  // per-user first-hour windows: genuinely overlapping interval workload
  private lazy val intervals: DataFrame =
    Tables.events(spark, sf001)
      .groupBy("user_id")
      .agg(min(unix_timestamp(col("ts"))).as("lo"))
      .withColumn("hi", col("lo") + 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("user_id", "lo", "hi")

  private def rangeJoin(p: DataFrame, i: DataFrame): DataFrame =
    p.join(i, p("sec") >= i("lo") && p("sec") <= i("hi"))
      .select(p("event_id"), i("user_id"))

  private def withRule[A](width: Long)(body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeBinJoinRule
    spark.conf.set(RangeBinJoinRule.ConfKey, width.toString)
    try body
    finally {
      spark.conf.unset(RangeBinJoinRule.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeBinJoinRule)
    }
  }

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("disabled by default: the theta range join stays a nested loop (the baseline)") {
    val p = planOf(rangeJoin(points, intervals))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"without the rule Catalyst has no equi-key and must nested-loop:\n${p.take(1500)}")
  }

  test("enabled: plans an equi-join on the synthesized bin, results identical to the nested loop") {
    val baseline = rangeJoin(points, intervals).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(baseline.nonEmpty, "fixture must produce in-window matches")
    withRule(3600L) {
      val df = rangeJoin(points, intervals)
      val plan = planOf(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"the rule must remove the nested loop:\n${plan.take(2000)}")
      assert(plan.contains("graft_bin"),
        "the synthesized bin key must appear in the physical plan")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == baseline, "bin-join results diverge from the nested-loop baseline")
    }
  }

  test("bin width narrower than the interval: multi-bin explode still yields no duplicates") {
    val baseline = rangeJoin(points, intervals).collect().length
    withRule(700L) { // 3600-second intervals span ~6 bins each
      assert(rangeJoin(points, intervals).collect().length == baseline,
        "a pair meeting in several bins must still be emitted exactly once")
    }
  }

  test("edges: empty intervals match nothing, NULL bounds match nothing, boundaries included") {
    val p = Seq(0L, 5L, 10L, 15L).toDF("sec").withColumn("event_id", col("sec"))
    val i = Seq(
      (1L, 5L, 10L),   // picks up 5 and 10 (both boundaries)
      (2L, 12L, 11L),  // empty: lo > hi
      (3L, 14L, 20L)   // picks up 15
    ).toDF("user_id", "lo", "hi")
      .unionByName(Seq(4L).toDF("user_id")
        .withColumn("lo", lit(null).cast("long"))
        .withColumn("hi", lit(null).cast("long")))
    def run() = p.join(i, p("sec") >= i("lo") && p("sec") <= i("hi"))
      .select(p("event_id"), i("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val baseline = run()
    assert(baseline == Seq((5L, 1L), (10L, 1L), (15L, 3L)))
    withRule(4L) { assert(run() == baseline) }
  }

  test("half-open windows (>= lo AND < hi): strict bound enforced exactly") {
    val p = Seq(0L, 5L, 9L, 10L, 11L).toDF("sec").withColumn("event_id", col("sec"))
    val i = Seq((1L, 5L, 10L)).toDF("user_id", "lo", "hi")
    def run() = p.join(i, p("sec") >= i("lo") && p("sec") < i("hi"))
      .select(p("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(run() == Seq(5L, 9L), "baseline: 10 excluded by the strict bound")
    withRule(4L) {
      val df = p.join(i, p("sec") >= i("lo") && p("sec") < i("hi"))
      assert(planOf(df).contains("graft_bin"), "the rule must fire on half-open windows")
      assert(run() == Seq(5L, 9L),
        "the strict upper bound must survive the rewrite verbatim")
    }
  }

  test("an extra non-range conjunct is preserved through the rewrite") {
    def run() = points.as("p").join(intervals.as("i"),
        col("p.sec") >= col("i.lo") && col("p.sec") <= col("i.hi") &&
          col("p.event_id") % 2 === col("i.user_id") % 2)
      .select(col("p.event_id"), col("i.user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val baseline = run()
    withRule(3600L) { assert(run() == baseline) }
  }

  test("a join that already has an equi-conjunct is left untouched") {
    val df = points.as("p").join(intervals.as("i"),
      col("p.event_id") === col("i.user_id") &&
        col("p.sec") >= col("i.lo") && col("p.sec") <= col("i.hi"))
    withRule(3600L) {
      assert(!planOf(df).contains("graft_bin"),
        "an existing equi-key already hash-joins; binning must not fire")
    }
  }

  test("an interval spanning too many bins fails with an actionable message, not an opaque one") {
    // width 1 over a ~10^9-second interval would synthesize a Sequence
    // past Spark's array limit — the guard must name the conf instead
    // (and never silently cap, which would drop matches)
    val giant = Seq((1L, 0L, 3000000000L)).toDF("user_id", "lo", "hi")
    withRule(1L) {
      val e = intercept[Exception] { rangeJoin(points, giant).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains(RangeBinJoinRule.ConfKey) ||
          m.contains("raise the bin width")),
        s"error must point at the bin-width conf: ${msgs(e)}")
    }
    // the same data succeeds once the width is plausible
    withRule(3600L) {
      val n = rangeJoin(points, giant).count()
      assert(n == points.count(), "every point falls in the giant interval")
    }
  }
}
