package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: materialize q_semdedup's FULL result (collect, not count) at an
  * arbitrary SF dir. Perf's `.count()` is vacuous for this query —
  * Catalyst correctly drops the left join against the cluster-keyed pair
  * aggregate when no column is consumed, so the pair stage never runs
  * under a count. Round-13 record: 10× 3.71 s / 100× 14.80 s (k ≈ √n
  * clustering; the round-12 fixed-label regime read 2.07 / 303.9). */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = if (args.length > 1) args(1).toInt else 2
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val rows = graft.queries.VectorOps.qSemdedup(spark, args(0)).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Caches.drain(spark)
      println(s"SEMPROBE rows=${rows.length} " +
        s"pairs=${rows.map(_.getLong(2)).sum} pruned=${rows.map(_.getLong(3)).sum}")
      dt
    }
    println(f"SEMPROBE min ${times.min}%.2f s over $reps reps")
    spark.stop()
  }
}
