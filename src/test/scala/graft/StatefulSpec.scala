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
