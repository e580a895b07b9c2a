package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, Caches, Bench}
object MbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    // stage 1: basket build alone
    val baskets = Tables.lineitem(spark, dir).select("l_orderkey","l_partkey")
      .groupBy("l_orderkey").agg(collect_set("l_partkey").as("parts"))
    t("baskets(noop)") { Bench.materialize(baskets) }
    val baskets2 = Tables.lineitem(spark, dir).select("l_orderkey","l_partkey")
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey").agg(collect_set("l_partkey").as("parts"))
    t("baskets(repart-first)") { Bench.materialize(baskets2) }
    // stage 2: basket cached, pair count on top
    val sorted = Tables.lineitem(spark, dir).select("l_orderkey","l_partkey")
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey").agg(sort_array(collect_set("l_partkey")).as("parts"))
    val bc = Caches.registered(sorted)
    t("baskets(cache-mat)") { bc.count(); () }
    val lc = sorted.localCheckpoint(false)
    t("baskets(localckpt-mat)") { lc.count(); () }
    val pairs = bc.select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"))
      .filter(col("p1") < col("p2"))
      .groupBy((shiftleft(col("p1"),32).bitwiseOR(col("p2"))).as("pk"))
      .agg(count(lit(1)).as("c_ab"))
    t("pairs-count(noop)") { Bench.materialize(pairs) }
    val pairsSlice = bc.select(posexplode(col("parts")).as(Seq("i","p1")), col("parts"))
      .select(col("p1"), explode(expr("slice(parts, i + 2, size(parts))")).as("p2"))
      .groupBy((shiftleft(col("p1"),32).bitwiseOR(col("p2"))).as("pk"))
      .agg(count(lit(1)).as("c_ab"))
    t("pairs-count(slice)") { Bench.materialize(pairsSlice) }
    val pairs2 = bc.select(explode(col("parts")).as("p1"), col("parts"))
      .select(col("p1"), explode(col("parts")).as("p2"))
      .filter(col("p1") < col("p2"))
      .select((shiftleft(col("p1"),32).bitwiseOR(col("p2"))).as("pk"))
      .repartition(col("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("c_ab"))
    t("pairs-count(repart)") { Bench.materialize(pairs2) }
    val top = pairs.orderBy(col("c_ab").desc).limit(20)
    t("top20") { top.collect(); () }
    Caches.drain(spark)
    spark.stop()
  }
}
