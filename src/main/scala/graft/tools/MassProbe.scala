package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Structural pair-mass probe for the two pair-heavy 100× board leaders
  * at decades where their FULL materialization out-spills a single box's
  * scratch disk (the 1000× lesson: q_market_basket's basket+pair shuffles
  * and q_dedup_near's candidate join retain ~50-70 GB of shuffle files —
  * linear in n and key-partitioned, i.e. trivially distributed across a
  * cluster's scratch, but past this box's 63 GB /tmp). The probe computes
  * the exact quantity the scale claim is about — the raw pair mass the
  * self-join/explode stage emits — from SIZES alone, one aggregation, no
  * pair materialization:
  *
  *  - market basket: Σ C(|basket|, 2) over per-order distinct-part
  *    baskets (plus the max basket size, the bounded-by-domain claim);
  *  - near-dup LSH: Σ C(|bucket|, 2) over band buckets at or under
  *    BucketCap (oversized buckets are purged by the query, mirrored
  *    here), i.e. the raw candidate mass entering the band self-join.
  *
  * Run: runMain graft.tools.MassProbe <dir> [<dir> ...] */
object MassProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("benchdata/sf10x", "benchdata/sf1000x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val t0 = System.nanoTime()
      val b = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey").agg(size(collect_set("l_partkey")).as("sz"))
        .agg(count(lit(1)).as("orders"),
          sum(expr("CAST(sz AS BIGINT) * (sz - 1) div 2")).as("mass"),
          max("sz").as("maxsz")).head
      val tB = (System.nanoTime() - t0) / 1e9
      // Option-wrap like the neardup branch below: sum/max are NULL over
      // an empty lineitem dir, and a probe tool should report 0, not NPE
      println(f"MASSPROBE $dir%-24s basket   orders=${b.getLong(0)}%11d " +
        f"pairmass=${Option(b.get(1)).map(_.toString).getOrElse("0")}%12s " +
        f"maxbasket=${Option(b.get(2)).map(_.toString).getOrElse("0")}%3s wall=$tB%7.2f s")
      val t1 = System.nanoTime()
      val docs = graft.Tables.documents(spark, dir)
      val sig = graft.queries.Llm.sigOf(docs)
      val nd = graft.queries.Llm.bandsOfSig(sig)
        .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bn"))
        .agg(count(lit(1)).as("buckets"),
          sum(when(col("bn") <= graft.queries.Llm.BucketCap,
            expr("bn * (bn - 1) div 2"))).as("mass"),
          sum(when(col("bn") > graft.queries.Llm.BucketCap, col("bn")))
            .as("purged_docs")).head
      val tN = (System.nanoTime() - t1) / 1e9
      println(f"MASSPROBE $dir%-24s neardup  buckets=${nd.getLong(0)}%10d " +
        f"candmass=${Option(nd.get(1)).map(_.toString).getOrElse("0")}%12s " +
        f"purged=${Option(nd.get(2)).map(_.toString).getOrElse("0")}%10s wall=$tN%7.2f s")
    }
    spark.stop()
  }
}
