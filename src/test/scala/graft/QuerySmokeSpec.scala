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

  /** Queries whose correct result can legitimately be empty at tiny SFs. */
  private val mayBeEmpty = Set("q_except")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
