package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the single-row-group input bottleneck: every test table
  * is ONE parquet file with ONE row group, so a scan stage cannot split
  * below one task and all map-side work (partial aggregates, expression
  * lanes) runs on one core regardless of session parallelism. Times the
  * q_corr_matrix-shaped 15-lane decimal aggregate (the heaviest pure
  * scan-stage query) as-is vs behind a round-robin repartition, and
  * reports the scan partition count Spark actually planned. */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    println(s"scan partitions: ${li.rdd.getNumPartitions}")
    def agg(df: org.apache.spark.sql.DataFrame) = {
      val lanes = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(c => s"CAST(round($c * 100.0) AS BIGINT) AS ${c}_c")
      val cents = df.selectExpr("l_returnflag" +: lanes: _*)
      val pairs = for (i <- 0 until 4; j <- i until 4) yield (i, j)
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val sums = pairs.map { case (i, j) =>
        expr(s"CAST(sum(CAST(${cols(i)}_c * ${cols(j)}_c AS DECIMAL(38,0))) AS DOUBLE)")
          .as(s"p_${i}_$j") }
      cents.groupBy("l_returnflag").agg(count(lit(1)).as("n"), sums: _*)
    }
    def time(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); graft.Bench.materialize(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min ${ts.min}%6.2f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("agg as-is (1-task scan)", agg(li))
    time("agg behind repartition", agg(li.repartition(col("l_orderkey"))))
    // expression-lane shape (q_math_funcs): lanes before orderBy (they run
    // inside the 1-task scan stage) vs lanes after orderBy (they run in
    // the 32-way post-sort stage — IF the optimizer leaves the Project
    // above the Sort; the plan check below confirms)
    def lanes(df: org.apache.spark.sql.DataFrame) = df.select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_extendedprice") * lit(-1)).as("abs_price"),
      ceil(col("l_extendedprice")).as("ceil_price"),
      floor(col("l_extendedprice")).as("floor_price"),
      sqrt(col("l_extendedprice")).as("sqrt_price"),
      (col("l_quantity") * col("l_quantity")).as("qty_sq"),
      round(log(col("l_extendedprice")), 6).as("ln_price"),
      greatest(col("l_discount"), col("l_tax")).as("max_rate"),
      least(col("l_discount"), col("l_tax")).as("min_rate"),
      pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
    time("lanes then orderBy", lanes(li).orderBy("l_orderkey", "l_linenumber"))
    time("orderBy then lanes", lanes(li.orderBy("l_orderkey", "l_linenumber")))
    println(lanes(li.orderBy("l_orderkey", "l_linenumber"))
      .queryExecution.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    spark.stop()
  }
}
