package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q_resample_locf cost attribution at a given corpus dir. The `hourly`/
  * `spine`/`join`/`window` stages replay the NAIVE form (spine LEFT JOIN
  * observations + output-sized LOCF window — three output-sized passes);
  * `full` runs the shipped operator (lead-over-observations + range
  * explode, round 15), so the gap between `window`+sort and `full` is the
  * restructure's win and `spine` pins the output-emission floor. Measured
  * at 100×: naive 19.3 s vs inverted 6.75 s for 105M output rows, of
  * which the presentation sort is the dominant remaining term — the
  * output-bound certification row in PERF.md. Stages min-of-2 through the
  * noop sink. Run: runMain graft.tools.LocfAb <dir> */
object LocfAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "benchdata/sf10x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def hourly = graft.Tables.events(spark, dir).repartition(col("user_id"))
      .groupBy(col("user_id"), expr("date_trunc('hour', ts)").as("hr"))
      .agg(expr(graft.queries.Det.avgDec2("value")).as("v"))
    def spine = hourly.groupBy("user_id")
      .agg(min("hr").as("mn"), max("hr").as("mx"))
      .select(col("user_id"), explode(expr("sequence(mn, mx, interval 1 hour)")).as("hr"))
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.materialize(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"LOCFAB $dir $tag%-7s ${walls.min}%7.2f s")
    }
    def joined = spine.join(hourly, Seq("user_id", "hr"), "left")
    def locf = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("hr")
        .rowsBetween(Long.MinValue, 0)
      joined.select(col("user_id"), col("hr"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        when(col("v").isNull, 1).otherwise(0).as("is_gap"))
    }
    println(s"LOCFAB $dir rows_out=${spine.count()} users=${spine.select("user_id").distinct().count()}")
    time("hourly")(hourly)
    time("spine")(spine)
    time("join")(joined)
    time("window")(locf)
    time("full")(graft.queries.Analytics.qResampleLocf(spark, dir))
    spark.stop()
  }
}
