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

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    // synthesize a hot key: one join key carries ~150x the rows of every
    // other, with an incompressible payload so shuffle-block sizes reflect
    // row counts; AQE must split the oversized partition instead of
    // letting one task straggle — the first failure mode of a skewed
    // lineitem⨝orders at 100 TB
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = spark.range(0, 200000).select(
        when(col("id") < 150000, 0L).otherwise(col("id") % 50).as("k"),
        sha2(col("id").cast("string"), 256).as("payload"))
      val right = spark.range(0, 5000).select(
        (col("id") % 50).as("k"),
        sha2(col("id").cast("string"), 512).as("rpayload"))
      val j = left.join(right, "k")
      val expected = left.groupBy("k").count().withColumnRenamed("count", "ln")
        .join(right.groupBy("k").count().withColumnRenamed("count", "rn"), "k")
        .agg(sum(col("ln") * col("rn"))).head.getLong(0)
      assert(j.count() == expected)
      // run THIS dataset's own plan (count() plans its own tree), then
      // read the final adaptive plan off it
      j.queryExecution.toRdd.foreach(_ => ())
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot-key join side skew=true; plan was:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("static partition pruning: a day filter prunes the file listing to that day's directory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // the 100 TB table layout: events partitioned by day; a day-filtered
    // query must list and read ONLY that day's files — PartitionFilters in
    // the plan string is necessary but not sufficient, so this asserts the
    // actual selected-partition COUNT on the FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("pp_days").toString
    Tables.events(spark, sf001).withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val part = spark.read.parquet(dir)
    val nDays = part.select("day").distinct().count()
    assert(nDays > 1, s"fixture must span multiple days, got $nDays")
    val day = Tables.events(spark, sf001)
      .agg(min(to_date(col("ts")))).head.getDate(0).toString
    // AQE scoped off so the executed plan is directly introspectable
    // (AdaptiveSparkPlanExec is a leaf that hides the scan from collect)
    SessionConfs.withConf(spark, "spark.sql.adaptive.enabled" -> "false") {
      val q = part.filter(col("day") === lit(day).cast("date"))
        .groupBy("event_type").count()
      val scans = q.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty, "expected a FileSourceScanExec")
      assert(scans.head.selectedPartitions.partitionCount == 1,
        s"the day filter must prune the listing to 1 of $nDays partitions, " +
          s"got ${scans.head.selectedPartitions.partitionCount}")
      val full = part.groupBy("event_type").count()
      val fullScan = full.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }.head
      assert(fullScan.selectedPartitions.partitionCount == nDays,
        "the unfiltered scan must list every day partition")
      // pruning must not change the answer
      val expect = Tables.events(spark, sf001)
        .filter(to_date(col("ts")) === lit(day).cast("date"))
        .groupBy("event_type").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect)
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    import spark.implicits._
    // the 100 TB shape: a fact table partitioned on a key, joined to a
    // small dim whose FILTER (not the fact's) decides which partitions
    // matter — static pruning can't see it, DPP must inject the dim's
    // qualifying keys into the fact scan's PartitionFilters at runtime
    val dir = java.nio.file.Files.createTempDirectory("dpp_fact").toString
    Tables.events(spark, sf001).write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real datasource: a Seq-backed LocalRelation gets
    // its Filter constant-folded away (ConvertToLocalRelation) before the
    // PartitionPruning rule looks for a selective predicate
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue"), ("signup", "growth"), ("error", "ops"))
      .toDF("et", "grp").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = fact.join(dim.filter(col("grp") === "revenue"), col("event_type") === col("et"))
    assert(j.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      s"expected a dynamicpruning expression in the fact scan:\n${j.queryExecution.executedPlan.toString.take(3000)}")
    assert(j.count() ==
      Tables.events(spark, sf001).filter(col("event_type") === "purchase").count())
  }

  test("runtime bloom filter: a selective dim filter pre-prunes the fact side of a shuffle join") {
    // when the join can't broadcast, Spark can still build a bloom filter
    // from the (filtered) creation side and apply it to the fact scan
    // BEFORE the shuffle — at 100 TB this is the difference between
    // shuffling the full fact table and shuffling the ~matching rows
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = Tables.lineitem(spark, sf001)
      val dim = Tables.orders(spark, sf001).filter(col("o_orderstatus") === "P")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter:\n${opt.take(3000)}")
      val expect = fact.join(dim.hint("broadcast"), col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expect)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
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

  test("KLL sketch quantiles land within 5% normalized rank of the target") {
    val rows = graft.queries.Relational.qAggKll(spark, sf001).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf001)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sorted) }
    rows.foreach { r =>
      val (flag, n) = (r.getString(0), r.getLong(4))
      val sorted = data(flag)
      assert(sorted.length == n)
      Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3))
        .foreach { case (q, v) =>
          // the sketch returns an element of the data whose NORMALIZED
          // RANK is within epsilon of the request (k=200 -> ~1.65%)
          val rank = sorted.count(_ <= v).toDouble / sorted.length
          assert(math.abs(rank - q) <= 0.05, s"$flag p$q: value $v has rank $rank")
          assert(sorted.contains(v), s"$flag p$q: $v is not an element of the data")
        }
    }
    // mergeability: a sketch built from partials over any partitioning
    // still satisfies the same rank bound (exactness is NOT promised —
    // KLL compaction is randomized)
    val merged = Tables.lineitem(spark, sf001).repartition(16)
      .agg(graft.functions.KllQuantile.kllQuantile(col("l_extendedprice"), 0.5).as("m"))
      .head.getDouble(0)
    val all = data.values.flatten.toArray.sorted
    val mrank = all.count(_ <= merged).toDouble / all.length
    assert(math.abs(mrank - 0.5) <= 0.05, s"merged p50 $merged has rank $mrank")
  }

  test("approx_percentile tracks exact percentiles within 5%") {
    val exact = Tables.lineitem(spark, sf001).groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val apx = graft.queries.Relational.qAggApproxPercentile(spark, sf001).collect()
    assert(apx.nonEmpty)
    apx.foreach { r =>
      val flag = r.getString(0)
      val (e25, e50, e95) = exact(flag)
      val (a25, a50, a95) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(a25 <= a50 && a50 <= a95, s"$flag: sketch quantiles must be monotone")
      assert(math.abs(a25 - e25) / e25 <= 0.05, s"$flag p25: $a25 vs $e25")
      assert(math.abs(a50 - e50) / e50 <= 0.05, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 <= 0.05, s"$flag p95: $a95 vs $e95")
    }
  }

  test("HLL sketch aggregate works on string keys too") {
    val d = Tables.documents(spark, sf001)
    val h = d.agg(hllDistinct(col("source"))).head.getLong(0)
    val e = d.agg(countDistinct(col("source"))).head.getLong(0)
    assert(h == e, s"20 sources is far below sketch error range: $h vs $e")
  }

  test("salting spreads a 90%-hot key across reducers and stays exactly equal to the plain plan") {
    // adversarial power-law shape: 90% of rows carry ONE key. The salted
    // operators are plan-locked elsewhere; this is the stress test that the
    // salt actually SPREADS the hot key's volume (measured rows-per-reducer
    // under the real hash partitioning) and changes no result.
    val n = 100000L
    val r = 32
    val skewed = spark.range(n).select(
      col("id"),
      when(col("id") % 10 =!= 0, lit(0L)).otherwise(pmod(col("id"), lit(97))).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id().as("p")).count().agg(max("count")).head.getLong(0)
    // AQE off so the measured distribution is the static hash partitioning
    // a non-AQE deployment (the case the manual salt exists for) would see
    val (plainMax, saltedMax) = SessionConfs.withConf(spark,
        "spark.sql.adaptive.enabled" -> "false") {
      (maxPartRows(skewed.repartition(r, col("k"))),
        maxPartRows(skewed.withColumn("salt", pmod(col("id"), lit(r)))
          .repartition(r, col("k"), col("salt"))))
    }
    assert(plainMax >= (n * 9) / 10, s"hot key must concentrate without salt, got $plainMax")
    // 4x, not the ideal 32x: the 32 (key, salt) sub-groups themselves hash
    // into 32 partitions, and balls-in-bins clumping puts 3-5 sub-groups in
    // the fullest partition (measured 6.4x spread) — the property under
    // test is that NO reducer owns the hot key's whole volume anymore
    assert(saltedMax * 4 < plainMax,
      s"salt must spread the hot key at least 4x: salted max $saltedMax vs plain $plainMax")
    // two-phase salted aggregation == direct aggregation, bit-for-bit
    val direct = skewed.groupBy(col("k")).agg(count(lit(1)).as("cnt"),
        expr("CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
      .orderBy("k").collect().toSeq
    val salted = Scale.saltedCountSum(skewed, col("k"), "CAST(v AS DECIMAL(18,2))", r)
      .orderBy("k").collect().toSeq
    assert(salted == direct, "salted two-phase aggregate must equal the direct plan")
    // salted join == plain join on the same skewed fact
    val dim = spark.range(0, 97).select(col("id").as("dk"),
      concat(lit("g"), pmod(col("id"), lit(5))).as("grp"))
    val plainJoin = skewed.join(dim, col("k") === col("dk"))
      .groupBy("grp").agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)").as("sv"))
      .orderBy("grp").collect().toSeq
    val factS = skewed.withColumn("salt", pmod(col("id"), lit(r)))
    val dimS = dim.withColumn("salt", explode(sequence(lit(0), lit(r - 1))))
    val saltedJoin = factS.join(dimS.hint("merge"),
        factS("k") === dimS("dk") && factS("salt") === dimS("salt"))
      .groupBy("grp").agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)").as("sv"))
      .orderBy("grp").collect().toSeq
    assert(saltedJoin == plainJoin, "salted join must equal the plain join")
  }

  test("AQE coalesces small post-shuffle partitions on a skewed aggregate (runtime stats)") {
    // complement of the skew-SPLIT test above: after map-side partial
    // aggregation the hot key's shuffle output is tiny, and AQE must merge
    // the 64 static post-shuffle partitions down instead of scheduling 64
    // near-empty tasks — the runtime re-plan a static fan-out can't do
    SessionConfs.withConf(spark,
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB",
        "spark.sql.shuffle.partitions" -> "64") {
      val agg = spark.range(0, 100000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(pmod(col("id"), lit(97))).as("k"))
        .groupBy("k").count()
      assert(agg.count() == 97, "97 distinct keys expected")
      val parts = agg.rdd.getNumPartitions
      assert(parts < 64, s"AQE must coalesce the 64 static partitions, got $parts")
      agg.queryExecution.toRdd.foreach(_ => ())
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"expected a coalesced AQEShuffleRead in the final adaptive plan:\n${plan.take(2000)}")
    }
  }

  test("ER blocking recall floor: planted near-duplicates always survive the corpus-adaptive key (sf0.1 / 10x / 100x)") {
    // The round-14 fixed-width key failed this floor: at 100x nearly every
    // (segment, bin) block exceeded the 256 cap and was purged, so recall
    // collapsed monotonically with corpus growth. The corpus-adaptive width
    // (span*cap/(2n), floored at ErMinWidth) keeps expected block occupancy
    // ~cap/2 at every scale, and the ErMinWidth floor pins the GUARANTEED
    // radius: a planted pair within ErMinWidth/2 = 50 cents shares a bin in
    // one of the two offset passes at ANY corpus size. Plant one duplicate
    // per ~101 customers (same segment, <=2-edit name, <=40-cent balance
    // gap — the near-identical-balance band real duplicate records live in)
    // and assert EVERY planted pair emerges as an is_match=1 candidate.
    def recallAt(dir: String, tag: String): Unit = {
      val cust = Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      val maxK = cust.agg(max("c_custkey")).head.getLong(0)
      val planted = cust.filter(col("c_custkey") % 101 === 0)
        .select(
          (col("c_custkey") + lit(maxK + 1)).as("c_custkey"),
          concat(expr("substring(c_name, 1, length(c_name) - 2)"), lit("QZ")).as("c_name"),
          col("c_mktsegment"),
          // exact-cents perturbation in [-40, 40]: integer-valued doubles
          // round-trip /100*100 exactly under round()
          expr("(round(c_acctbal * 100) + pmod(c_custkey, 81) - 40) / 100.0").as("c_acctbal"))
      val nPlanted = planted.count()
      assert(nPlanted > 0, s"$tag: fixture must plant at least one duplicate")
      val expected = cust.filter(col("c_custkey") % 101 === 0)
        .select(col("c_custkey").as("k_a"), (col("c_custkey") + lit(maxK + 1)).as("k_b"))
      val found = graft.queries.Behavior.erCandidates(cust.unionAll(planted))
        .join(expected, Seq("k_a", "k_b"))
        .agg(count(lit(1)).as("n"), min("is_match").as("m")).head
      assert(found.getLong(0) == nPlanted,
        s"$tag: recall floor broken — ${found.getLong(0)} of $nPlanted planted pairs survived blocking")
      assert(found.getInt(1) == 1, s"$tag: a planted pair scored is_match=0")
      info(s"$tag: all $nPlanted planted pairs recovered")
    }
    recallAt("/root/testdata/sf0.1", "sf0.1")
    // Derived corpora only count when their on-disk recipe stamp matches
    // the current ScaleUp.DerivationVersion: a pre-v2 corpus (verbatim
    // cloned names/balances) fails the floor for a DATA-staleness reason
    // indistinguishable from a code regression. Missing/old stamp → skip
    // loudly, naming the re-derive command.
    def recallAtIfCurrent(dir: String, tag: String): Unit = {
      if (!new java.io.File(s"$dir/customer.parquet").exists()) {
        info(s"$tag derived corpus absent"); return
      }
      val marker = java.nio.file.Paths.get(dir, "_derivation_version")
      val v = if (java.nio.file.Files.exists(marker))
        new String(java.nio.file.Files.readAllBytes(marker),
          java.nio.charset.StandardCharsets.UTF_8).trim.toIntOption
      else None
      val want = graft.tools.ScaleUp.DerivationVersion
      if (v.contains(want)) recallAt(dir, tag)
      else info(s"$tag corpus at $dir has derivation stamp " +
        s"${v.map(_.toString).getOrElse("<none>")} (current recipe v$want) — " +
        s"stale data, not a code signal; re-run graft.tools.ScaleUp to refresh")
    }
    recallAtIfCurrent("/root/repo/benchdata/sf1x", "10x")
    recallAtIfCurrent("/root/repo/benchdata/sf10x", "100x")
    // 1000× — the decade where the balance width floor binds (bins hit
    // the cap) and the PassJoin name-segment re-blocking must carry the
    // floor instead of the round-14-style recall collapse. ~15M planted
    // corpus = minutes of wall, so opt-in; run it whenever the blocking
    // recipe changes and record the board in PERF.md.
    if (sys.env.get("SPARK_GRAFT_SCALE_DEEP").contains("1"))
      recallAtIfCurrent("/root/repo/benchdata/sf1000x", "1000x")
    else info("1000x deep leg skipped (set SPARK_GRAFT_SCALE_DEEP=1 to run)")
  }

  test("ngramEdges memoizes: the second request serves the SAME materialized frame") {
    val a = graft.queries.VectorOps.ngramEdges(spark, sf001)
    val b = graft.queries.VectorOps.ngramEdges(spark, sf001)
    assert(a eq b, "the per-(session, SF) edge memo must return one frame")
    // the served frame is a checkpoint leaf — consumers never replay the
    // pair pipeline (no parquet scan of documents in its plan)
    val p = a.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      s"memoized edges must be materialized, not lineage:\n${p.take(1500)}")
  }
}
