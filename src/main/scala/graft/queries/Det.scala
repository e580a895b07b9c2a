package graft.queries

/** Determinism fragments shared verbatim between the Spark side
  * (`expr(...)`) and the DuckDB oracle SQL, so both engines evaluate the
  * textually identical expression.
  *
  * Why: `round(sum(double), 4)` is NOT a reliable comparator — Spark rounds
  * the shortest-decimal repr (Java `BigDecimal.valueOf`) while DuckDB rounds
  * the true binary value, and this data (2-decimal prices times 2-decimal
  * rates) lands on exact `...5` ties constantly (73/60000 rows diverged in
  * testing). Every double column in the testdata is exactly 2-decimal
  * (verified: max|x - round(x,2)| = 0 for all of them), so casting to
  * DECIMAL is lossless and decimal aggregation is exact and
  * order-independent. The rule set:
  *
  *   1. Per-row double arithmetic: raw IEEE ops, same expression shape both
  *      sides, NO rounding -> bit-identical.
  *   2. Order-dependent aggregates (sum/avg, windowed sums): cast operands
  *      to DECIMAL, aggregate exactly, cast the final result to DOUBLE.
  *   3. Decimal precisions kept small enough that Spark's 38-digit cap is
  *      never hit (Spark would silently round scale; DuckDB would differ).
  */
object Det {

  /** Exact sum of a 2-decimal double column, surfaced as DOUBLE. */
  def sumDec2(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact average of a 2-decimal double column (sum exact, one double
    * division at the end — identical operands on both engines). */
  def avgDec2(c: String): String =
    s"(CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count(*))"

  /** l_extendedprice * (1 - l_discount), exact decimal; scale 4. */
  val revDec: String =
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1.00 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))"

  /** revenue * (1 + l_tax), exact decimal; scale 6. */
  val chargeDec: String =
    s"(CAST($revDec AS DECIMAL(18,4)) * " +
      "CAST(1.00 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)))"

  /** l_extendedprice * l_discount, exact decimal; scale 4. */
  val discRevDec: String =
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)))"

  def sumAsDouble(decExpr: String): String = s"CAST(sum($decExpr) AS DOUBLE)"
}
