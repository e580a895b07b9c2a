package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q_er_blocking scale probe: per corpus dir, the corpus row count, the
  * adaptive bin width the plan derives, the emitted candidate-pair count
  * (the levenshtein mass), pairs-per-row, and min-of-2 wall through the
  * noop sink — the evidence row PERF.md carries for "pair mass grows
  * linearly and recall stays flat" (the round-14 fixed-width key instead
  * PURGED nearly every block at 100×: 1.39 s wall BECAUSE candidates had
  * collapsed). Run: runMain graft.tools.ErProbe <dir> [<dir> ...] */
object ErProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "benchdata/sf1x", "benchdata/sf10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val cust = graft.Tables.customer(spark, dir)
      val n = cust.count()
      val stats = cust
        .agg(count(lit(1)).as("n_c"),
          min(expr("CAST(round(c_acctbal * 100) AS BIGINT) + 100000")).as("mn"),
          max(expr("CAST(round(c_acctbal * 100) AS BIGINT) + 100000")).as("mx"))
        .withColumn("bw", expr(
          s"greatest(${graft.queries.Behavior.ErMinWidth}L, " +
            s"((mx - mn + 1L) * ${graft.queries.Behavior.ErBlockCap}L) div (2L * n_c))"))
        .head
      // SPARK_GRAFT_ER_SIZES_ONLY=1: report the raw self-join pair mass
      // Σ C(|block|, 2) from the query's OWN kept-block frame (one skinny
      // groupBy — no pair join, no distinct). At 1000× (15M rows) the
      // real self-join's ~1G raw pairs out-spill a single box's 63 GB
      // /tmp even under a count — a single-node scratch limit, not a plan
      // defect (the shuffle is key-partitioned and linear in n) — while
      // the size-derived mass is exact, corpus-cheap, and IS the quantity
      // whose per-row flatness the probe certifies. The distinct/raw
      // ratio is calibrated at the SFs where both are measurable.
      if (sys.env.get("SPARK_GRAFT_ER_SIZES_ONLY").contains("1")) {
        val t0c = System.nanoTime()
        val raw = graft.queries.Behavior.erKeptBlocks(cust)
          .groupBy("seg", "bin", "pass", "sidx", "sstr")
          .agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) div 2"))).head.getLong(0)
        val wall = (System.nanoTime() - t0c) / 1e9
        println(f"ERPROBE $dir%-28s n=$n%9d bw=${stats.getLong(3)}%6d " +
          f"rawpairs=$raw%11d rawpairs/row=${raw.toDouble / n}%6.1f sizewall=$wall%7.2f s (sizes-only)")
      } else {
        val pairs = graft.queries.Behavior.qErBlocking(spark, dir).count()
        val walls = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          graft.Bench.materialize(graft.queries.Behavior.qErBlocking(spark, dir))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"ERPROBE $dir%-28s n=$n%9d bw=${stats.getLong(3)}%6d " +
          f"pairs=$pairs%10d pairs/row=${pairs.toDouble / n}%6.1f wall=${walls.min}%7.2f s")
      }
    }
    spark.stop()
  }
}
