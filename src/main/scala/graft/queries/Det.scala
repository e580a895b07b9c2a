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
  *
  * The canonical trap list (each bitten at least once; the fixes live in
  * the named helpers/queries):
  *
  *   - SCALE-0 LIFT [[liftDec2]]: DuckDB casts DECIMAL(p,s)->DOUBLE as
  *     double(unscaled)/10^s — TWO roundings — so any decimal aggregate
  *     that can cross 2^53 unscaled must be multiplied into an exact
  *     scale-0 integer before the cast and divided back in float space
  *     (q_time_weighted_avg, q_ab_ttest, q_mv_incremental, q_cohort_ltv).
  *   - 38-DIGIT RE-BOUND: past 38 digits Spark silently SHRINKS decimal
  *     scale while DuckDB ERRORS; re-cast intermediates to DECIMAL(30,·)
  *     before multiplying (the armSum lift in Behavior.scala).
  *   - DIVIDE-BY-ZERO SPLIT: Spark's non-ANSI Divide yields NULL on a zero
  *     divisor, DuckDB follows IEEE (inf/NaN) — guard every potentially-
  *     zero divisor with the SAME `CASE WHEN d = 0 THEN NULL` text on both
  *     sides, and clamp near-zero variances with greatest(0.0, ·) before
  *     sqrt (q_anomaly_days, q_ab_ttest).
  *   - greatest/least NULL SPLIT: Spark skips NULL operands, DuckDB does
  *     not — never let an engine-visible greatest/least see a NULL.
  *   - INT CAST vs floor: a bare int cast of a division TRUNCATES in Spark
  *     but ROUNDS in DuckDB — write floor() explicitly (q_churn_matrix).
  *   - CROSS-ENGINE PRIMITIVES: sha2(col,256) <-> DuckDB sha256();
  *     unix_micros <-> epoch_us; floor(x·2^k) is rounding-free (exponent
  *     shift — the quantization trick of q_cluster_assign/q_quantize_int8).
  *   - CENTS RECOVERY: round(x·100) recovers the EXACT integer cents from
  *     a 2-decimal double on both engines (x·100 lands within one ulp of
  *     the true k ≤ 2^53; the value is never an exact .5 tie) — no
  *     decimal cast needed in per-row hot paths (q_corr_matrix lanes).
  *   - NO `DIV` IN DUCKDB: Spark's integer `a DIV b` has no DuckDB
  *     spelling (`//` there) — shared text must use floor(a / b) with
  *     exact-below-2^53 operands, or keep the division engine-local.
  *   - Spark 4 `collect()` returns java.time.LocalDateTime/LocalDate for
  *     TIMESTAMP_NTZ/DATE — `Row.getTimestamp`/`getDate` throw; tests
  *     cast to string (ISO order = chronological order) before collect.
  *   - EXACT-INTEGER KERNELS: where a float kernel could never hash-match
  *     (dot products, z-scores, PageRank mass), compute in scaled BIGINT —
  *     the codegen'd expressions [[graft.functions.VectorExpressions]]
  *     `Int8Codes` (symmetric int8 quantization codes) and `SrpSignature`
  *     (64-plane SRP signature in one fused pass) are the reusable
  *     kernels; q_pagerank runs a whole iterative algorithm this way.
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

  /** Scale-0 lift for a scale-2 decimal aggregate that grows with corpus
    * size (and so WILL cross 2^53 unscaled at some SF): DuckDB casts
    * DECIMAL(p,2) to DOUBLE as double(unscaled)/100.0 — TWO roundings —
    * while Spark rounds the decimal once. Multiplying into an exact
    * scale-0 integer first (lossless: the value has exactly 2 decimals)
    * and dividing back in float space makes both engines round once, on
    * identical operands. The DECIMAL(30,2) re-bound keeps the ×100 under
    * 38 digits on both engines (Spark would silently shrink the scale;
    * DuckDB would reject the multiply). */
  def liftDec2(c: String): String =
    s"(CAST(CAST(CAST($c AS DECIMAL(30,2)) * 100 AS DECIMAL(38,0)) AS DOUBLE) / 100.0)"

  /** [[liftDec2]] for scale-4 aggregates (sums of 2-decimal × 2-decimal
    * products — squares, cross products, discounted revenue). */
  def liftDec4(c: String): String =
    s"(CAST(CAST(CAST($c AS DECIMAL(30,4)) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 10000.0)"
}
