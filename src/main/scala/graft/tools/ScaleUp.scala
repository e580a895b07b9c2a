package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives an order-of-magnitude-larger bench corpus from a driver SF dir
  * by unioning `copies` key-shifted replicas of every table — the sweep
  * that grounds the "plans hold at 100×" claims with a measured 10×
  * (BENCH at the derived dir vs the source dir, PERF.md).
  *
  * Semantics of the derivation (NOT a naive duplicate):
  *  - every key domain shifts by `copy * (max_id + 1)` CONSISTENTLY across
  *    tables (custkey in customer+orders, orderkey in orders+lineitem,
  *    part/supp in part/supplier+lineitem, doc_id shared by documents and
  *    embeddings.vec_id), so referential structure and join selectivity
  *    are preserved exactly;
  *  - dimension tables (region, nation) stay fixed — as at real scale;
  *  - document TEXT goes through a per-copy BIJECTIVE letter substitution
  *    (an affine permutation of the alphabet per copy, upper and lower
  *    case; copy 0 is identity; 312 distinct maps support up to a 312-copy
  *    derivation), so overlap across copies is ZERO at EVERY granularity —
  *    word bigrams AND character shingles — and near-dup pair mass grows
  *    LINEARLY like a real corpus. (The previous word-suffix scheme only
  *    de-overlapped word n-grams: character 5-gram MinHash still saw
  *    word-interior shingles shared across copies, which manufactured
  *    ~0.5-similar cross-copy doc pairs and quadratic LSH candidate mass
  *    — an artifact of the derivation, not a property of real corpora.)
  *    The substitution preserves length (n_chars), all within-copy
  *    equality/Jaccard/edit-distance structure, and per-copy token
  *    frequency distributions exactly;
  *  - embeddings rotate their lanes by the copy index (a permutation, so
  *    norms and within-copy geometry are untouched) — cross-copy cosine
  *    near-dups vanish instead of exploding;
  *  - events keep their time range (10× events in the same window =
  *    denser activity, the realistic direction for user analytics).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "benchdata/sf1x"
    val copies = if (args.length > 2) args(2).toInt else 10
    // Optional 4th arg: comma-separated table subset. The text/embedding
    // bijection families bound the copy count (312 letter maps, 2·dim
    // vector maps) while the key-shift tables replicate cleanly at ANY
    // multiplier — a subset derivation can therefore push the relational
    // tables a full decade further than the text tables without composing
    // colliding maps (deriving documents 10× FROM sf10x would compose
    // 1000 affine maps into the 312-element group: ~3 copies per composed
    // map = manufactured cross-copy exact dups, the artifact class the
    // substitution exists to prevent). Excluded tables are not written
    // and their copy-count bounds are not enforced.
    val include: String => Boolean = {
      if (args.length > 3) { val ts = args(3).split(",").toSet; ts.contains }
      else _ => true
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1
    val custStride = maxOf(tbl("customer"), "c_custkey")
    val orderStride = maxOf(tbl("orders"), "o_orderkey")
    val partStride = maxOf(tbl("part"), "p_partkey")
    val suppStride = maxOf(tbl("supplier"), "s_suppkey")
    val userStride = maxOf(tbl("events"), "user_id")
    val eventStride = maxOf(tbl("events"), "event_id")
    val docStride = maxOf(tbl("documents"), "doc_id")

    // union of `copies` shifted replicas: one explode drives all copies in
    // a single pass over the source
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val withC = df.withColumn("__c", explode(sequence(lit(0L), lit(copies - 1L))))
      shifts.foldLeft(withC) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + col("__c") * stride)
      }
    }
    def write(df: => DataFrame, n: String, parts: Int): Unit = if (include(n)) {
      df.drop("__c").repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$n.parquet")
      println(s"wrote $n")
    }

    write(tbl("region"), "region", 1)
    write(tbl("nation"), "nation", 1)
    write(replicate(tbl("customer"), Map("c_custkey" -> custStride)), "customer", 4)
    write(replicate(tbl("supplier"), Map("s_suppkey" -> suppStride)), "supplier", 1)
    write(replicate(tbl("part"), Map("p_partkey" -> partStride)), "part", 4)
    write(replicate(tbl("orders"),
      Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)), "orders", 8)
    write(replicate(tbl("lineitem"),
      Map("l_orderkey" -> orderStride, "l_partkey" -> partStride,
        "l_suppkey" -> suppStride)), "lineitem", 16)
    write(replicate(tbl("events"),
      Map("event_id" -> eventStride, "user_id" -> userStride)), "events", 8)
    // Per-copy bijective letter substitution: the affine permutation
    // π_c(i) = (a·i + b) mod 26 over alphabet positions, with a coprime
    // to 26 — 12 units × 26 shifts = 312 distinct bijections, enough for
    // a 100-copy (100×) derivation. Two DISTINCT affine maps agree on
    // the solution set of (a1-a2)·i ≡ b2-b1 (mod 26), which has size
    // gcd(a1-a2, 26) ∈ {0, 2} when solvable (both units are odd, so the
    // difference is even) — e.g. (a=1,b=0) and (a=3,b=0) both fix 'a'
    // and 'n'. Tokens drawn ONLY from a copy pair's ≤2 fixed letters
    // ("an", "nana") can therefore collide across copies: a measured-zero
    // overlap in practice (no such all-fixed-letter word survives the
    // fixture's vocabulary) and a negligible dup-mass perturbation if one
    // ever did — accepted rather than shrinking the unit set, which would
    // cap the derivation below 100 copies. Copy 0 is (a=1, b=0) =
    // identity. Length-preserving, so n_chars stays valid as-is.
    val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    require(!include("documents") || copies <= units.length * 26,
      s"only ${units.length * 26} distinct copy bijections")
    val alphaL = ('a' to 'z').mkString
    val alphaU = ('A' to 'Z').mkString
    def perm(s: String, c: Int): String = {
      val a = units(c / 26); val b = c % 26
      s.indices.map(i => s((a * i + b) % 26)).mkString
    }
    val textCol = (1 until copies)
      .foldLeft(when(col("__c") === 0, col("text"))) { (acc, c) =>
        acc.when(col("__c") === c,
          translate(col("text"), alphaL + alphaU, perm(alphaL, c) + perm(alphaU, c)))
      }
      .otherwise(col("text")) // unreachable: __c ∈ [0, copies) is enumerated
    val docs = replicate(tbl("documents"), Map("doc_id" -> docStride))
      .withColumn("text", textCol)
    write(docs, "documents", 8)
    // Lane rotation by (copy mod dim), composed with a whole-vector sign
    // flip once the rotations wrap (copy >= dim) — both orthogonal maps,
    // so norms and within-copy geometry are untouched, and a wrapped copy
    // lands at cosine -1 from its un-flipped twin instead of +1 (no
    // manufactured cross-copy near-dups for any positive-cosine
    // threshold). Injective only up to 2*dim copies: copy 2*dim would be
    // byte-identical to copy 0 (cosine +1 twins), silently reintroducing
    // the quadratic manufactured-near-dup artifact — so the bound is
    // ENFORCED against the table's actual dimension, not assumed.
    if (include("embeddings")) {
    val embDim = tbl("embeddings")
      .selectExpr("size(embedding)").head.getInt(0)
    require(copies <= 2 * embDim,
      s"embedding map is injective only up to ${2 * embDim} copies (dim $embDim)")
    val emb = replicate(tbl("embeddings"), Map("vec_id" -> docStride))
      .withColumn("__k", expr("CAST(pmod(__c, size(embedding)) AS INT)"))
      .withColumn("__s", expr("CASE WHEN (__c div size(embedding)) % 2 = 0 THEN CAST(1.0 AS FLOAT) ELSE CAST(-1.0 AS FLOAT) END"))
      .withColumn("embedding", expr(
        "transform(CASE WHEN __k = 0 THEN embedding ELSE " +
          "concat(slice(embedding, __k + 1, size(embedding) - __k), " +
          "slice(embedding, 1, __k)) END, x -> x * __s)"))
      .drop("__k", "__s")
    write(emb, "embeddings", 8)
    }
    spark.stop()
    println(s"scaled $src x$copies -> $dst")
  }
}
