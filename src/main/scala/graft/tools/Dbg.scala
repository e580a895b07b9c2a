package graft.tools
import org.apache.spark.sql.SparkSession
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_agg_argmax","q_agg_median","q_agg_listagg","q_agg_regression",
      "q_bitmap_distinct","q_funnel","q_quantize_int8","q_stream_enrich","q_stream_join",
      "q_dedup_containment","q_dedup_ngram","q_dedup_incremental","q_embedding_outliers","q_sql_q3",
      "q_win_moving_avg","q_agg_mode","q_winsorize","q_attribution")
    names.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      val rng = "Exchange rangepartitioning".r.findAllIn(p).length
      val single = "Exchange SinglePartition".r.findAllIn(p).length
      val bnl = if (p.contains("BroadcastNestedLoopJoin")) " BNLJ!" else ""
      val cart = if (p.contains("CartesianProduct")) " CARTESIAN!" else ""
      val sort = if (p.contains("GlobalSort")) " GLOBALSORT" else ""
      println(f"$n%-24s hash=$ex range=$rng single=$single$bnl$cart$sort")
    }
    spark.stop()
  }
}
