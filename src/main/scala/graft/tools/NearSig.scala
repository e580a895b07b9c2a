package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-split of q_dedup_near's signature stage: scan-only vs shingle
  * kernel vs fused signature kernel, min-of-N each (steady state, unlike
  * NearStage's deliberate first-run walls). */
object NearSig {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextExpressions.{minHashSig, shingleHashes}
    val docs = graft.Tables.documents(spark, sfDir)
    def t(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); graft.Bench.materialize(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s min ${ts.min}%6.2f  runs ${ts.map(x => f"$x%.2f").mkString(" ")}")
    }
    t("scan only")(docs)
    t("scan+repartition")(docs.repartition(col("doc_id")))
    t("shingle kernel")(docs.repartition(col("doc_id"))
      .select(col("doc_id"), shingleHashes(col("text"), 5).as("sh")))
    t("shingle+sig array")(docs.repartition(col("doc_id"))
      .select(col("doc_id"), minHashSig(shingleHashes(col("text"), 5)).as("ms")))
    t("sigOf (33-col unpack)")(graft.queries.Llm.sigOf(docs))
    t("sigOf no repartition")(docs.filter(length(col("text")) >= 5)
      .select(col("doc_id"), minHashSig(shingleHashes(col("text"), 5)).as("ms"))
      .select(col("doc_id") +: (0 until 32).map(i => col("ms").getItem(i).as(s"m$i")): _*))
    spark.stop()
  }
}
