package graft.tools
import org.apache.spark.sql.SparkSession

/** Diagnostic: heap + storage footprint of the session memos (edge index,
  * rare-bigram index, BPE merges) on the 100x corpus — run when a long
  * bench session shows memory-pressure symptoms to rule the memos in or
  * out (measured round 12: all memos together hold ~132 MB storage /
  * ~250 MB heap at 100x — far below anything that matters at 8 GiB). */
object MemoFoot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/repo/benchdata/sf10x"
    def mem(tag: String): Unit = {
      System.gc(); Thread.sleep(500)
      val rt = Runtime.getRuntime
      val used = (rt.totalMemory - rt.freeMemory) / 1e6
      val sm = spark.sparkContext.getExecutorMemoryStatus.values.head
      val rdds = spark.sparkContext.getPersistentRDDs
      val storUsed = (sm._1 - sm._2) / 1e6
      println(f"MEM $tag%-22s heapUsed=${used}%8.0f MB storageUsed=${storUsed}%8.0f MB persistentRDDs=${rdds.size}")
    }
    mem("start")
    graft.queries.VectorOps.qDedupNgram(spark, sf).count()
    mem("after ngramEdges")
    graft.SparkEntry.queries("q_bpe_train")(spark, sf).count()
    mem("after bpe_train")
    graft.SparkEntry.queries("q_dedup_near")(spark, sf).count()
    graft.Caches.drain(spark)
    mem("after dedup_near+drain")
    spark.stop()
  }
}
