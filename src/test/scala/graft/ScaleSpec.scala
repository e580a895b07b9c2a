package graft

import graft.functions.HllDistinct.hllDistinct
import org.apache.spark.sql.functions._

/** Scale-mechanics evidence: bucketed co-located joins eliminate the
  * shuffle; the DataSketches HLL aggregate merges losslessly across
  * partitions and tracks exact distinct counts. */
class ScaleSpec extends SparkSuite {

  test("bucketed tables join with no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_cust_b")
    Tables.orders(spark, sf001).write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("g_orders_b")
    Tables.customer(spark, sf001).write.mode("overwrite")
      .bucketBy(4, "c_custkey").saveAsTable("g_cust_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("g_orders_b")
        .join(spark.table("g_cust_b"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
      val expect = Tables.orders(spark, sf001)
        .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
        .count()
      assert(j.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_cust_b")
    }
  }

  test("HLL sketch aggregate within 5% of exact, and merge-consistent across repartitions") {
    val ev = Tables.events(spark, sf001)
    val got = ev.groupBy("event_type")
      .agg(hllDistinct(col("user_id")).as("hll"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (h, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(h - e) / e <= 0.05, s"${r.getString(0)}: hll $h vs exact $e")
    }
    // partial-aggregation merge must be deterministic in its estimate:
    // different physical partitionings -> same sketch estimate
    val a = ev.repartition(1).agg(hllDistinct(col("user_id"))).head.getLong(0)
    val b = ev.repartition(7).agg(hllDistinct(col("user_id"))).head.getLong(0)
    assert(a == b, s"sketch estimate must be partitioning-invariant: $a vs $b")
  }

  test("HLL sketch aggregate works on string keys too") {
    val d = Tables.documents(spark, sf001)
    val h = d.agg(hllDistinct(col("source"))).head.getLong(0)
    val e = d.agg(countDistinct(col("source"))).head.getLong(0)
    assert(h == e, s"20 sources is far below sketch error range: $h vs $e")
  }
}
