package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split for q_dedup_embcos' broadcast nested-loop pair scan: is the
  * wall the 64-dim dot kernel or the per-pair join machinery? */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorExpressions.dot
    val e = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 4096)
      .withColumn("nrm",
        sqrt(expr("aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
    val a = e.repartition(col("vec_id"))
      .select(col("vec_id").as("a_id"), col("embedding").as("av"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("bv"), col("nrm").as("nb"))
    def t(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-36s min ${ts.map(_._1).min}%6.2f  n=${ts.head._2}")
    }
    t("id-only condition (count)") {
      a.join(broadcast(b), col("a_id") < col("b_id")).count()
    }
    val cosExpr = round(dot(col("av"), col("bv")) / (col("na") * col("nb")), 6)
    t("id + cos condition (count)") {
      a.join(broadcast(b), col("a_id") < col("b_id") && cosExpr >= 0.45).count()
    }
    t("full query (noop)") {
      graft.Bench.materialize(graft.queries.VectorOps.qDedupEmbcos(spark, sfDir)); 0L
    }
    spark.stop()
  }
}
