package graft

import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Behavior, TextOps, VectorOps}

/** Cross-query invariants for the round-6 operators — properties the
  * DuckDB hash-equality gate cannot express (internal consistency between
  * queries, agreement with Spark's own built-ins). */
class BehaviorSpec extends SparkSuite {

  test("retention: offset-0 row equals cohort size and bounds every later offset") {
    val rows = Behavior.qRetention(spark, sf001).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val day0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(rows.nonEmpty && day0.nonEmpty)
    rows.foreach { case (cohort, off, n) =>
      assert(day0.contains(cohort), s"cohort $cohort missing its offset-0 row")
      assert(n <= day0(cohort), s"cohort $cohort offset $off: $n > cohort size ${day0(cohort)}")
    }
  }

  test("transitions: total transition count is events minus active users") {
    val total = Behavior.qEventTransitions(spark, sf001).agg(sum("n")).collect()(0).getLong(0)
    val ev = Tables.events(spark, sf001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expected, s"sum of transitions $total != events - users $expected")
  }

  test("streaks: per-user totals agree with the deduped user-day frame") {
    val s = Behavior.qWinStreaks(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val userDays = Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.map(_._1).toSet == userDays.keySet)
    s.foreach { case (u, days, streaks, maxStreak) =>
      assert(days == userDays(u))
      assert(maxStreak <= days && streaks <= days && maxStreak >= 1 && streaks >= 1)
    }
  }

  test("skewkurt matches Spark's built-in population moments") {
    val got = Analytics.qAggSkewKurt(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4), r.getDouble(5))).toMap
    val ref = Tables.lineitem(spark, sf001).groupBy("l_returnflag")
      .agg(avg("l_quantity").as("m"), skewness("l_quantity").as("sk"), kurtosis("l_quantity").as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    got.foreach { case (k, (m, sk, ku)) =>
      val (rm, rsk, rku) = ref(k)
      assert(math.abs(m - rm) < 1e-9, s"$k mean $m vs $rm")
      assert(math.abs(sk - rsk) < 1e-6, s"$k skewness $sk vs $rsk")
      assert(math.abs(ku - rku) < 1e-6, s"$k kurtosis $ku vs $rku")
    }
  }

  test("zorder: buckets partition the table; lane ranges nest inside bucket bit prefixes") {
    val rows = Analytics.qZorderLayout(spark, sf001).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, sf001).count(), "every order must land in a bucket")
    rows.foreach { r =>
      val (bkt, minZ, maxZ) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert((minZ >> 22) == bkt && (maxZ >> 22) == bkt, "z range must stay inside its bucket")
    }
  }

  test("dedup_edit pairs are a subset of ngram candidates with high similarity") {
    val edit = VectorOps.qDedupEdit(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    edit.foreach { case ((a, b), sim) =>
      assert(a < b, "pair orientation")
      assert(sim >= 0.8 && sim <= 1.0, s"edit_sim $sim out of range")
    }
  }

  test("vocab coverage: totals agree with the corpus token count") {
    val cov = TextOps.qVocabCoverage(spark, sf001).collect()
    val totalToks = Tables.documents(spark, sf001)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(cov.map(_.getLong(1)).sum == totalToks)
    cov.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "OOV cannot exceed total")
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate < 1.0, s"oov_rate $rate out of range")
    }
  }

  test("skipgrams: dist-1 pairs agree with the non-distinct bigram counts") {
    val sg = TextOps.qTextSkipgrams(spark, sf001).collect()
    assert(sg.length == 20)
    // counts are positive and sorted desc with the declared tie-break
    val ns = sg.map(_.getLong(3))
    assert(ns.forall(_ > 0) && ns.sameElements(ns.sortBy(-_)))
  }
}
