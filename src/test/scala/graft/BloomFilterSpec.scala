package graft

import graft.functions.{BloomProbe, GraftFunctions}
import graft.functions.BloomFilter.{bloomAgg, bloomContains}
import org.apache.spark.sql.functions._

/** Bloom build aggregate + codegen'd probe: the membership contract (no
  * false negatives, bounded false positives), partitioning-independence of
  * the merged bitmap, and the SQL registration path. */
class BloomFilterSpec extends SparkSuite {

  private def urgentKeys = Tables.orders(spark, sf001)
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey").as("k"))

  test("no false negatives: every inserted key probes true") {
    val bloom = urgentKeys.agg(bloomAgg(col("k")).as("bf"))
    val misses = urgentKeys.crossJoin(broadcast(bloom))
      .filter(!bloomContains(col("bf"), col("k")))
      .count()
    assert(misses == 0, s"$misses inserted keys probed false — Bloom contract broken")
  }

  test("false-positive rate is bounded for absent keys") {
    val bloom = urgentKeys.agg(bloomAgg(col("k")).as("bf"))
    // keys shifted out of the orderkey domain: none were inserted
    val absent = urgentKeys.select((col("k") + 1000000000L).as("k"))
    val n = absent.count()
    val fp = absent.crossJoin(broadcast(bloom))
      .filter(bloomContains(col("bf"), col("k")))
      .count()
    // 2^20 bits / ~1.5k keys at sf0.001 -> theoretical FP ~ 1e-11; allow 1%
    assert(fp.toDouble / n < 0.01, s"$fp/$n absent keys probed true")
  }

  test("bitmap is partitioning-independent (merge = byte OR, order-free)") {
    val many = urgentKeys.repartition(32)
      .agg(bloomAgg(col("k")).as("bf")).head.getAs[Array[Byte]]("bf")
    val one = urgentKeys.coalesce(1)
      .agg(bloomAgg(col("k")).as("bf")).head.getAs[Array[Byte]]("bf")
    assert(java.util.Arrays.equals(many, one),
      "bloom bitmap must not depend on partitioning or merge order")
  }

  test("kernel: set/contains round-trip and definite-absence semantics") {
    val bits = new Array[Byte](1 << 10)
    val keys = (0L until 500L).map(_ * 7919L)
    keys.foreach(BloomProbe.set(bits, _, 5))
    assert(keys.forall(BloomProbe.contains(bits, _, 5)), "false negative in kernel")
    // an empty filter rejects everything
    val empty = new Array[Byte](1 << 10)
    assert(keys.forall(!BloomProbe.contains(empty, _, 5)))
  }

  test("SQL registration: graft_bloom_agg / graft_bloom_contains match the Column API") {
    GraftFunctions.register(spark)
    urgentKeys.createOrReplaceTempView("bloom_keys")
    val sqlMisses = spark.sql(
      """SELECT count(*) AS misses FROM bloom_keys
        |CROSS JOIN (SELECT graft_bloom_agg(k) AS bf FROM bloom_keys)
        |WHERE NOT graft_bloom_contains(bf, k)""".stripMargin)
      .head.getLong(0)
    assert(sqlMisses == 0)
  }
}
