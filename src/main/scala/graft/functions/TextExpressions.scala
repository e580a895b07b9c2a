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
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
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

object TextExpressions {
  /** Rolling polynomial hash of a string column (see [[RollingHash]]). */
  def rollHash(s: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(s)))
}
