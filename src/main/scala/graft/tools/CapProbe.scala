package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What do the two remaining FIXED caps actually drop as the corpus
  * grows? (round-14 verdict nit: q_er_blocking's fixed cap silently
  * collapsed recall at 100×; these two are DESIGNED to drop boilerplate
  * hubs, and this probe quantifies that the dropped mass tracks
  * boilerplate — a ~flat FRACTION of postings — not corpus size.)
  *
  *  - q_dedup_substring's stop-window purge: anchored 8-token windows
  *    shared by > TextOps.SubstringStopCap docs leave the posting index
  *    before the self-join.
  *  - RareDfCap: bigrams with document frequency > 50 never generate
  *    candidate pairs in the n-gram dedup family.
  *
  * Per dir: total postings, postings in purged keys, purged fraction,
  * distinct keys purged. Run: runMain graft.tools.CapProbe <dir>... */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "benchdata/sf10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
      val winDf = graft.queries.TextOps.anchoredWindows(docs)
        .groupBy("w").agg(count(lit(1)).as("n_docs"))
      val stopCap = graft.queries.TextOps.SubstringStopCap
      val w = winDf.agg(
        sum("n_docs").as("post"),
        sum(when(col("n_docs") > stopCap, col("n_docs"))).as("purged"),
        count(lit(1)).as("keys"),
        count(when(col("n_docs") > stopCap, lit(1))).as("purged_keys")).head
      println(f"CAPPROBE $dir stopwin  postings=${w.getLong(0)}%10d purged=${Option(w.get(1)).map(_.toString).getOrElse("0")}%10s " +
        f"frac=${Option(w.get(1)).map(_.asInstanceOf[Long].toDouble).getOrElse(0.0) / w.getLong(0)}%8.4f " +
        f"keys=${w.getLong(2)}%9d purged_keys=${w.getLong(3)}%6d")
      val bgDf = graft.queries.VectorOps.docBigrams(docs, distinct = true)
        .groupBy("bg").agg(count(lit(1)).as("df"))
      val b = bgDf.agg(
        sum("df").as("post"),
        sum(when(col("df") > graft.queries.VectorOps.RareDfCap, col("df"))).as("purged"),
        count(lit(1)).as("keys"),
        count(when(col("df") > graft.queries.VectorOps.RareDfCap, lit(1))).as("purged_keys")).head
      println(f"CAPPROBE $dir raredf   postings=${b.getLong(0)}%10d purged=${Option(b.get(1)).map(_.toString).getOrElse("0")}%10s " +
        f"frac=${Option(b.get(1)).map(_.asInstanceOf[Long].toDouble).getOrElse(0.0) / b.getLong(0)}%8.4f " +
        f"keys=${b.getLong(2)}%9d purged_keys=${b.getLong(3)}%6d")
    }
    spark.stop()
  }
}
