package graft

/** Every declared query runs and returns rows at sf0.001 (fast regression
  * net; full value correctness is the driver's DuckDB gate + tools/check.py).
  */
class QuerySmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q_decontaminate is non-vacuous: the eval set really overlaps the corpus") {
    // guard against the round-10 failure mode where the stand-in eval set
    // shared zero shingles with the corpus at the driver's SF and the
    // green oracle row certified an empty join — the derived set (first 50
    // docs) must keep producing real contamination hits
    val rows = SparkEntry.queries("q_decontaminate")(spark, sf001).collect()
    assert(rows.nonEmpty, "decontamination scan found no contaminated docs")
    assert(rows.map(_.getLong(1)).sum > 0, "5-gram hits must be non-vacuous")
    // the GPT-3/PaLM-standard width must ALSO really fire on the fixture —
    // a vacuous 13-gram column would certify an empty join
    assert(rows.map(_.getLong(2)).sum > 0, "13-gram hits must be non-vacuous")
    // Doc-level subset is the mathematically guaranteed property (every
    // 13-gram contains a 5-gram, so a doc with any 13-gram overlap has
    // 5-gram overlap). The stronger per-doc COUNT inequality
    // n_hits_13 <= n_hits_5 is NOT guaranteed — repetitive text can share
    // more distinct 13-grams than distinct 5-grams (e.g. 'a'*13+'b'+'a'*13
    // shares 14 distinct 13-grams but only 6 distinct 5-grams) — so assert
    // only the membership implication, which no fixture can break.
    assert(rows.forall(r => r.getLong(2) == 0L || r.getLong(1) > 0L),
      "subset: any doc with 13-gram hits must also have 5-gram hits")
    assert(rows.forall(_.getLong(0) >= 50L), "eval-set docs must not appear in the corpus side")
  }
}
