package graft.tools
import org.apache.spark.sql.SparkSession
/** One-off stage split for q_dedup_near at a given SF dir: the signature
  * build (shingle scan + 32-way minhash agg — the linear, unavoidable
  * cost) vs the full pipeline (banding + candidates + exact verify). */
object NearStage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    // FIRST-run wall per stage: the stage frames are manually cached so a
    // min-of-N would read the cache on rep 2 and report the read, not the
    // compute (the r14 first-draft mistake).
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    t("signature-build") { graft.Bench.materialize(graft.queries.Llm.sigOf(docs)) }
    import org.apache.spark.sql.functions._
    // replicate the pipeline stages to time each on top of a cached sig
    val shRaw = graft.queries.Llm.sigShingles(docs)
    val sig = graft.queries.Llm.sigFromShingles(shRaw).cache()
    sig.count()
    val bands = graft.queries.Llm.bandsOfSig(sig)
    val okB = bands.groupBy("band_idx","band_hash").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 500).select("band_idx","band_hash")
    val bj = bands.join(okB, Seq("band_idx","band_hash"))
    val left = bj.select(col("band_idx"), col("band_hash"), col("doc_id").as("a_id"))
    val right = bj.select(col("band_idx").as("bi"), col("band_hash").as("bh"), col("doc_id").as("b_id"))
    val cands = left.join(right, col("band_idx")===col("bi") && col("band_hash")===col("bh") && col("a_id")<col("b_id"))
      .select("a_id","b_id").distinct().cache()
    t("candidates") { println("  n=" + cands.count()) }
    val sigA = sig.select(col("doc_id").as("a_id") +: (0 until 32).map(i => col(s"m$i").as(s"a_m$i")): _*)
    val sigB = sig.select(col("doc_id").as("b_id") +: (0 until 32).map(i => col(s"m$i").as(s"b_m$i")): _*)
    val est = (0 until 32).map(i => when(col(s"a_m$i")===col(s"b_m$i"),1).otherwise(0)).reduce(_ + _)
    val strong = cands.join(sigA, Seq("a_id")).join(sigB, Seq("b_id")).filter(est >= 17).select("a_id","b_id").cache()
    t("sieve(unpacked)") { println("  n=" + strong.count()) }
    def packed(idCol: String, pfx: String) =
      sig.select(col("doc_id").as(idCol) +: (0 until 16).map(j =>
        (col(s"m${2*j}").bitwiseOR(shiftleft(col(s"m${2*j+1}"), 32))).as(s"$pfx$j")): _*)
    val estP = (0 until 32).map { i =>
      val (a, b) = (col(s"a_p${i/2}"), col(s"b_p${i/2}"))
      val (ha, hb) =
        if (i % 2 == 0) (a.bitwiseAND(lit(0xffffffffL)), b.bitwiseAND(lit(0xffffffffL)))
        else (shiftrightunsigned(a, 32), shiftrightunsigned(b, 32))
      when(ha === hb, 1).otherwise(0)
    }.reduce(_ + _)
    val strongP = cands.join(packed("a_id","a_p"), Seq("a_id")).join(packed("b_id","b_p"), Seq("b_id"))
      .filter(estP >= 17).select("a_id","b_id").cache()
    t("sieve(packed)") { println("  n=" + strongP.count()) }
    strongP.unpersist()
    val candDocs = strong.select(col("a_id").as("doc_id")).union(strong.select(col("b_id").as("doc_id"))).distinct()
    val sh = shRaw.join(broadcast(candDocs), Seq("doc_id"), "left_semi").distinct().cache()
    t("cand-shingles") { println("  n=" + sh.count()) }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val sa = sh.select(col("doc_id").as("a_id"), col("sh"))
    val sb = sh.select(col("doc_id").as("b_id"), col("sh"))
    val inter = strong.join(sa, Seq("a_id")).join(sb, Seq("b_id","sh")).groupBy("a_id","b_id").agg(count(lit(1)).as("n_inter"))
    t("exact-verify") { graft.Bench.materialize(inter) }
    sig.unpersist(); cands.unpersist(); strong.unpersist(); sh.unpersist()
    t("full-pipeline") { graft.Bench.materialize(graft.queries.Llm.nearDupPairs(docs)) }
    spark.stop()
  }
}
