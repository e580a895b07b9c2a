package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the bench materialization primitive: `.count()` (lets Catalyst
  * prune output-column work whose cardinality is guaranteed) vs a
  * noop-sink write (consumes every row and column — prune-proof).
  * Prints per-query deltas above a threshold and both totals. */
object NoopAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    graft.SparkEntry.queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      graft.Caches.drain(spark)
    }
    def pass(mat: org.apache.spark.sql.DataFrame => Unit): Map[String, Double] =
      graft.SparkEntry.queries.map { case (n, fn) =>
        val t0 = System.nanoTime()
        try mat(fn(spark, sfDir)) catch { case _: Throwable => () }
        val t = (System.nanoTime() - t0) / 1e9
        graft.Caches.drain(spark)
        n -> t
      }
    val c = pass(_.count())
    val w = pass(_.write.mode("overwrite").format("noop").save())
    val diffs = c.keys.map(k => (k, c(k), w(k), w(k) - c(k))).toSeq.sortBy(-_._4)
    diffs.filter(d => d._4 > 0.3).foreach { case (k, cc, ww, d) =>
      println(f"NOOPAB $k%-24s count $cc%6.2f  noop $ww%6.2f  delta +$d%5.2f s") }
    println(f"NOOPAB TOTAL count ${c.values.sum}%.1f s  noop ${w.values.sum}%.1f s")
    spark.stop()
  }
}
