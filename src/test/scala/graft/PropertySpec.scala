package graft

import graft.functions.SimHash
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (SURVEY.md §5.2.3) — scalacheck generators driving
  * both pure kernels (cheap, many cases) and DataFrame ops (few cases,
  * tiny frames). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(label: String, n: Int, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val ids = Gen.listOfN(30, Gen.chooseNum(0L, 9L))
    check("idempotence", 10, Prop.forAll(ids) { xs =>
      val df = xs.zipWithIndex.map { case (id, i) => (id, i.toLong) }.toDF("event_id", "payload")
      val once = Pipeline.dedupEvents(df)
      val twice = Pipeline.dedupEvents(once)
      once.count() == twice.count() &&
        once.select("event_id").collect().map(_.getLong(0)).sorted.sameElements(
          xs.distinct.sorted)
    })
  }

  test("union/intersect/except agree with the Set model") {
    val small = Gen.listOf(Gen.chooseNum(0, 20))
    check("set algebra", 10, Prop.forAll(small, small) { (xs, ys) =>
      val a = xs.toDF("v"); val b = ys.toDF("v")
      def vals(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.getInt(0)).toSet
      vals(a.union(b).distinct()) == (xs.toSet union ys.toSet) &&
        vals(a.intersect(b)) == (xs.toSet intersect ys.toSet) &&
        vals(a.except(b)) == (xs.toSet diff ys.toSet)
    })
  }

  test("simhash is permutation-invariant and deterministic") {
    val words = Gen.nonEmptyListOf(Gen.oneOf(
      "the", "fast", "key", "order", "sort", "table", "scan", "merge", "spark"))
    check("simhash", 100, Prop.forAll(words) { ws =>
      val t = ws.mkString(" ")
      val shuffled = scala.util.Random.shuffle(ws).mkString(" ")
      SimHash.simhash64(t) == SimHash.simhash64(t) &&
        SimHash.simhash64(t) == SimHash.simhash64(shuffled)
    })
  }

  test("cosine kernel: symmetric, self-similarity 1, bounded") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
      .suchThat(_.exists(v => math.abs(v) > 0.01f))
    check("cosine", 50, Prop.forAll(vec, vec) { (a, b) =>
      def cos(x: Seq[Float], y: Seq[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        for (i <- x.indices) {
          dot += x(i).toDouble * y(i); na += x(i).toDouble * x(i); nb += y(i).toDouble * y(i)
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val ab = cos(a, b); val ba = cos(b, a); val aa = cos(a, a)
      ab == ba && math.abs(aa - 1.0) < 1e-12 && ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12
    })
  }

  test("TopKAggregator returns exactly the k best by (score desc, key asc)") {
    val rows = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0.0, 100.0), Gen.chooseNum(0L, 1000L)))
    check("topk", 10, Prop.forAll(rows) { xs =>
      val agg = udaf(new graft.functions.TopKAggregator(3))
      val got = xs.toDF("score", "key").agg(agg(col("score"), col("key")).as("top"))
        .select(explode(col("top"))).select("col.score", "col.key")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      val expect = xs.sortBy { case (s, k) => (-s, k) }.take(3)
      got == expect
    })
  }

  test("connected components equal a union-find model on random graphs") {
    import graft.queries.VectorOps
    // vertices 0..11; random edge sets, including disconnected and dense cases
    val edgeGen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)
    check("components", 15, Prop.forAll(edgeGen) { es =>
      val parent = scala.collection.mutable.ArrayBuffer.tabulate(12)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // model: every vertex -> min vertex id in its component
      val model = (0 until 12).map { v =>
        val root = find(v)
        v.toLong -> (0 until 12).filter(find(_) == root).min.toLong
      }.toMap
      val vertices = (0L to 11L).toDF("doc_id")
      val edges =
        if (es.isEmpty) Seq.empty[(Long, Long)].toDF("a_id", "b_id")
        else es.toDF("a_id", "b_id")
      val got = VectorOps.connectedComponents(vertices, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == model
    })
  }

  test("TopKAggregator merge laws: any partition split + merge order gives the sorted-take-k model") {
    import graft.functions.{ScoredKey, TopKAggregator}
    val agg = new TopKAggregator(3)
    def fold(xs: Seq[ScoredKey]) = xs.foldLeft(agg.zero)(agg.reduce)
    val score = Gen.frequency(
      9 -> Gen.chooseNum(0.0, 100.0),
      1 -> Gen.const(Double.NaN)) // NaN rows must be rejected, not buffered
    val rows = Gen.listOfN(20, Gen.zip(score, Gen.chooseNum(0L, 50L))
      .map { case (s, k) => ScoredKey(s, k) })
    val cut = Gen.chooseNum(0, 20)
    check("topk merge", 200, Prop.forAll(rows, cut, cut) { (xs, c1, c2) =>
      val clean = xs.filterNot(_.score.isNaN)
      val model = clean.sortBy(r => (-r.score, r.key)).take(3)
      // arbitrary 3-way partition split, both merge associations and both
      // argument orders — the shuffle can deliver partials any way at all
      val (a, rest) = xs.splitAt(math.min(c1, c2))
      val (b, c) = rest.splitAt(math.abs(c1 - c2))
      val (ba, bb, bc) = (fold(a), fold(b), fold(c))
      agg.merge(agg.merge(ba, bb), bc) == model &&
        agg.merge(ba, agg.merge(bb, bc)) == model &&
        agg.merge(agg.merge(bc, ba), bb) == model &&
        fold(xs) == model
    })
  }

  test("Int8Quant kernel: codes in range, endpoints pinned, dequant error within half a step") {
    import graft.functions.Int8Quant
    val vec = Gen.nonEmptyListOf(Gen.chooseNum(-100.0f, 100.0f))
      .suchThat(xs => xs.max > xs.min) // degenerate (constant) vectors raise by contract
    check("int8 quant", 200, Prop.forAll(vec) { xs =>
      val arr = xs.toArray
      val codes = Int8Quant.codes(arr).toString.split(',').map(_.toInt)
      val lmin = arr.min.toDouble; val lmax = arr.max.toDouble
      val step = (lmax - lmin) / 255.0
      codes.length == arr.length &&
        codes.forall(c => c >= -128 && c <= 127) &&
        codes(arr.indexOf(arr.min)) == -128 &&
        codes(arr.indexOf(arr.max)) == 127 &&
        arr.zip(codes).forall { case (x, c) =>
          // reconstruction from the code center lands within half a step
          // (+ a whisker for the double arithmetic)
          math.abs((c + 128) * step + lmin - x.toDouble) <= step / 2 + 1e-9
        }
    })
  }
}
