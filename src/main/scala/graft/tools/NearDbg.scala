package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cardinality probe for the near-dup (MinHash/LSH)
  * pipeline at an arbitrary SF dir — used to localize the sf1x spill
  * (round 11). Prints bucket-size distribution and candidate counts. */
object NearDbg {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/repo/benchdata/sf1x")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sf)
    println(s"docs=${docs.count()}")
    val sig = graft.queries.Llm.sigOf(docs).cache()
    val bands = graft.queries.Llm.bandsOfSig(sig).cache()
    println(s"band rows=${bands.count()}")
    val buckets = bands.groupBy("band_idx", "band_hash").agg(count(lit(1)).as("n"))
    buckets.cache()
    println("bucket size distribution (top 10):")
    buckets.orderBy(desc("n")).show(10, false)
    val pairMass = buckets.agg(sum(col("n") * (col("n") - 1) / 2)).head.get(0)
    println(s"total raw pair mass across buckets = $pairMass")
    // containment pipeline stage cardinalities
    val bg = graft.queries.VectorOps.docBigrams(docs).cache()
    println(s"bigram rows=${bg.count()}")
    val cand = graft.queries.VectorOps.rareCandidates(bg).cache()
    println(s"containment candidates=${cand.count()}")
    val candDocs = cand.select(col("a_id").as("doc_id"))
      .union(cand.select(col("b_id").as("doc_id"))).distinct()
    println(s"distinct candidate docs=${candDocs.count()}")
    spark.stop()
  }
}
