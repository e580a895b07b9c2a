package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[RollingHash]] — called from both eval and generated
  * code (Scala objects emit static forwarders). The fold replicates the SQL
  * HOF formulation EXACTLY — per CHARACTER (code point), acc·31 + cp,
  * mod 1e9+7 — because `ascii(substring(text, i, 1))` is the code point of
  * the i-th character, so the expression is a bit-identical drop-in for the
  * interpreted lambda. Iterating code points (not bytes, not UTF-16 units)
  * keeps that equality for any text, surrogate pairs included. */
object RollHash {
  final val Mod = 1000000007L
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      // defer the mod: from a reduced acc (< Mod < 2^30) six more
      // (acc*31 + cp) steps stay under 2^30·31^6·1.01 < 2^60, so one mod
      // per six characters replaces one per character — identical values,
      // since (a·31 + c) mod M folded lazily ≡ the eager per-step mod
      acc = acc * 31 + cp
      k += 1
      if (k == 6) { acc %= Mod; k = 0 }
      i += Character.charCount(cp)
    }
    acc % Mod
  }
}

/** Rolling polynomial content hash (base 31, mod 1e9+7) over a string
  * column's characters, as ONE codegen'd expression.
  *
  * Replaces the `aggregate(sequence(1, length(text)), ...)` HOF
  * formulation, which is quadratic per document — `substring(text, i, 1)`
  * re-scans the string from the start for every position (UTF-8 offsets
  * aren't random access), inside a CodegenFallback lambda interpreted per
  * character. This expression is one linear pass in generated code:
  * 3.16 s → ~0.2 s on the sf0.1 corpus (PERF.md round 12). The fingerprint
  * VALUES are unchanged (VectorExprSpec pins expression ≡ HOF equality),
  * so the DuckDB oracle's own fold still matches. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rollhash expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rollhash"

  override def nullSafeEval(a: Any): Any =
    RollHash.hash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollHash.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel for [[ShingleHashes]] — every width-`w` character
  * shingle's [[RollHash]] in ONE linear pass over the document: code
  * points are decoded once (one toString per DOCUMENT, not per shingle),
  * then each window folds the identical (acc·31 + cp) mod 1e9+7
  * arithmetic over its `w` code points. By construction
  * `hashes(s, w)(i) == RollHash.hash(substring(s, i+1, w))` — the
  * equality a per-position substring route pays O(doc²) UTF-8 re-scans
  * and a per-shingle String allocation for (locked in LlmSpec). */
object ShingleHash {
  def hashes(s: UTF8String, width: Int): Array[Long] = {
    val str = s.toString
    val cps = new Array[Int](str.length)
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    if (n < width) return Array.emptyLongArray
    val out = new Array[Long](n - width + 1)
    var p = 0
    if (width <= 9) {
      // defer the mod to once per WINDOW: code points are < 2^21, so a
      // width-9 unreduced fold stays under 2^21·(31^9-1)/30 < 2^61 — one
      // mod per shingle instead of one per character, identical values
      // (lazy vs eager mod over the same fold)
      while (p <= n - width) {
        var acc = 0L
        var j = 0
        while (j < width) { acc = acc * 31 + cps(p + j); j += 1 }
        out(p) = acc % RollHash.Mod
        p += 1
      }
    } else {
      while (p <= n - width) {
        var acc = 0L
        var j = 0
        while (j < width) { acc = (acc * 31 + cps(p + j)) % RollHash.Mod; j += 1 }
        out(p) = acc
        p += 1
      }
    }
    out
  }
}

/** All width-`width` shingle [[RollHash]]es of a string column as ONE
  * codegen'd array expression — `explode` it for the (position-ordered)
  * shingle id stream. Replaces explode(sequence) + per-position
  * `rollhash(substring(text, i+1, w))`, which re-scans the string from
  * the start per position (UTF-8 offsets aren't random access) and
  * allocates a String per shingle. Values are IDENTICAL by construction
  * (same fold, same code-point walk). */
case class ShingleHashes(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, s"graft_shingle_hashes width must be >= 1, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects string, got $t")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleHash.hashes(a.asInstanceOf[UTF8String], width))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHash.hashes($a, $width));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The MinHash family: 32 affine hashes (a·h + b) mod the 31-bit Mersenne
  * prime, seeds fixed by one seeded generator — the SINGLE SOURCE both the
  * Spark pipeline and the DuckDB oracle generator read (graft.queries.Llm
  * interpolates these exact longs into the replay SQL), so the two sides
  * cannot drift. Seeds are bounded to 31 bits so a·h + b stays well under
  * 2^63 (Spark 4 ANSI mode makes long overflow an error, not a wrap). */
object MinHash {
  final val NumHashes = 32
  final val MersennePrime = 2147483647L // 2^31 - 1
  val (hashA, hashB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue - 2).toLong + 1)
    val b = Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** All 32 minhashes of a NON-EMPTY shingle-id array in one pass —
    * per-element: h = sh mod P, then min-fold the 32 affine images.
    * Equals min-aggregating (h·aᵢ + bᵢ) mod P over the exploded shingle
    * stream (min is multiplicity- and order-insensitive; locked in
    * LlmSpec). Callers filter empty inputs (a doc with no shingles has NO
    * signature row, matching the groupBy route's semantics). */
  def signature(shs: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val n = shs.numElements()
    val m = Array.fill(NumHashes)(Long.MaxValue)
    val a = hashA; val b = hashB
    var i = 0
    while (i < n) {
      val s = shs.getLong(i)
      if (s >= 0 && s < MersennePrime) {
        // hot path (every rollhash shingle id is < 1e9+7 < P): P = 2^31-1
        // is Mersenne, so x mod P is two shift-and-mask folds plus one
        // conditional subtract instead of a 64-bit division — 2^31 ≡ 1
        // (mod P) makes x ≡ (x >>> 31) + (x & P); x = s·a + b < 2^62, the
        // first fold lands < 2^32, the second in [0, 2^31], and one
        // subtract normalizes. Branch-free of division, the inner loop
        // SIMD-vectorizes. Values are IDENTICAL to the % path (s ≥ 0).
        var j = 0
        while (j < NumHashes) {
          var x = s * a(j) + b(j)
          x = (x >>> 31) + (x & MersennePrime)
          x = (x >>> 31) + (x & MersennePrime)
          if (x >= MersennePrime) x -= MersennePrime
          if (x < m(j)) m(j) = x
          j += 1
        }
      } else {
        // ids outside [0, P) keep the original Java % semantics verbatim
        val h = s % MersennePrime
        var j = 0
        while (j < NumHashes) {
          val v = (h * a(j) + b(j)) % MersennePrime
          if (v < m(j)) m(j) = v
          j += 1
        }
      }
      i += 1
    }
    m
  }
}

/** Fused per-document MinHash signature: array<long> of shingle ids →
  * array<long> of [[MinHash.NumHashes]] minhashes, ONE codegen'd map-side
  * expression. Replaces explode(shingles) + a 32-way min hash-aggregate:
  * the signature becomes plain per-row map work — no agg hash table, no
  * aggregate buffer per doc, nothing between the scan and the banding —
  * which is the shape that matters at 100 TB where the signature pass IS
  * the dominant near-dup stage. Values are identical by construction
  * (min over a multiset, exact integer arithmetic; locked in LlmSpec). */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint>, got $t")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MinHash.signature(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHash.signature($a));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Rolling polynomial hash of a string column (see [[RollingHash]]). */
  def rollHash(s: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(s)))

  /** Array of all width-`w` shingle rollhashes (see [[ShingleHashes]]). */
  def shingleHashes(s: Column, width: Int): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(s), width))

  /** Fused 32-minhash signature of a shingle-id array (see
    * [[MinHashSignature]]). */
  def minHashSig(shingles: Column): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(shingles)))
}
