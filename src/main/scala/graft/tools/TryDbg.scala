package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TryDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"TRYDBG $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("base_sorted")(li.select(col("l_orderkey"), col("l_linenumber")).orderBy("l_orderkey", "l_linenumber"))
    t("try_divide")(li.select(expr("try_divide(l_extendedprice, floor(l_quantity) - 25)")))
    t("try_add_ovf")(li.select(expr("try_add(l_orderkey, CAST(9223372036854775807 AS BIGINT))")))
    t("try_cast_bad")(li.select(expr("try_cast(l_returnflag AS INT)")))
    t("try_cast_ok")(li.select(expr("try_cast(cast(l_orderkey AS STRING) AS INT)")))
    spark.stop()
  }
}
