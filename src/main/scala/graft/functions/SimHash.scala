package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import scala.util.hashing.MurmurHash3

/** 64-bit SimHash document fingerprint (SURVEY.md §2 B.11 q_udf_scalar).
  *
  * Classic Charikar simhash over whitespace tokens: each token hashes to
  * 64 bits (two 32-bit murmur3 halves with different seeds — deterministic,
  * JVM-independent); per bit position, +1 if set else -1, summed over
  * tokens; the sign vector is the fingerprint. Near-duplicate documents
  * differ in few bits (small Hamming distance).
  *
  * Scala UDF by design: genuinely custom semantics that no built-in
  * expression composes to. Documented boundary: Catalyst cannot push
  * predicates through it — callers filter AFTER fingerprinting. Per-row,
  * no state -> embarrassingly parallel at any scale.
  */
object SimHash {

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
        val tok = text.substring(start, end)
        val h = (MurmurHash3.stringHash(tok, 0xA5F152C3).toLong << 32) |
          (MurmurHash3.stringHash(tok, 0x1B873593).toLong & 0xFFFFFFFFL)
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
