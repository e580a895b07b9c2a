package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** 64-bit SimHash document fingerprint (SURVEY.md §2 B.11 q_udf_scalar).
  *
  * Classic Charikar simhash over whitespace tokens: each token hashes to
  * 64 bits; per bit position, +1 if set else -1, summed over tokens; the
  * sign vector is the fingerprint. Near-duplicate documents differ in few
  * bits (small Hamming distance).
  *
  * The token hash is DELIBERATELY built from SQL-replayable pieces so the
  * whole fingerprint is DuckDB-oracle-checkable (the `graft_rollhash`
  * discipline): a 31-polynomial rolling hash mod 1e9+7 over the token's
  * ASCII codes (identical to q_text_fingerprint's kernel), widened to 64
  * well-mixed bits by three xorshift-multiply rounds whose multipliers
  * are all < 2³² — public mixing constants (Knuth's 2654435761,
  * MurmurHash2's 1540483477, xxHash's PRIME32_2 2246822519) chosen small
  * so the oracle's HUGEINT products stay under 2⁹⁶ and every step is
  * expressible as `(z * M) % 2⁶⁴` / `xor(z, z // 2^k)` in SQL. On the
  * JVM the same steps are plain Long arithmetic: multiplication wraps
  * mod 2⁶⁴ natively and `>>>` matches the oracle's nonneg division.
  * Measured mixing quality: unrelated fixture docs sit at Hamming ~32
  * (the random expectation), one-word edits at ≤ 10.
  *
  * Scala UDF by design: genuinely custom semantics that no built-in
  * expression composes to. Documented boundary: Catalyst cannot push
  * predicates through it — callers filter AFTER fingerprinting. Per-row,
  * no state -> embarrassingly parallel at any scale.
  */
object SimHash {

  /** Token hash: rollhash (mod 1e9+7) → 64-bit xorshift-multiply mix.
    *
    * Iterates Unicode CODE POINTS, not UTF-16 code units: the DuckDB
    * replay CTE walks characters (`substring`/`length`/`ascii` are
    * code-point-semantics there), so a surrogate-pair character must
    * contribute ONE step with its full code point on the JVM too, or a
    * non-ASCII fixture would silently diverge the two engines. For ASCII
    * and all BMP text the two iterations are identical.
    */
  private[graft] def tokenHash64(tok: String): Long = {
    var acc = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      acc = (acc * 31 + cp.toLong) % 1000000007L
      i += Character.charCount(cp)
    }
    var z = acc * 2654435761L // < 2^30 * 2^32: no Long overflow before mixing
    z ^= (z >>> 29)
    z *= 1540483477L // wraps mod 2^64 — the oracle's (z*M) % 2^64
    z ^= (z >>> 32)
    z *= 2246822519L
    z ^ (z >>> 29)
  }

  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    while (start < n) {
      while (start < n && text.charAt(start) == ' ') start += 1
      var end = start
      while (end < n && text.charAt(end) != ' ') end += 1
      if (end > start) {
        val h = tokenHash64(text.substring(start, end))
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      start = end
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  val simhashUdf = udf(simhash64 _)

  def simhash(c: Column): Column = simhashUdf(c)
}
