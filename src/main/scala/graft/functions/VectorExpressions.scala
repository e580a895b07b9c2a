package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for dense vector kernels (SURVEY.md §7.3's
  * "custom Expression beats UDF" tier, realized).
  *
  * Why not HOFs: `aggregate`/`zip_with` lambdas are CodegenFallback —
  * interpreted per element. Why not UDFs: opaque to Catalyst and paying
  * serialization at the boundary. These expressions generate a primitive
  * Java loop inside WholeStageCodegen: vectorized-speed, null-safe,
  * Catalyst-visible (prunable/pushable around), and the accumulation order
  * (independent sequential folds for dot and both norms) is bit-identical
  * to the SQL/oracle HOF formulation they replace.
  *
  * Edge semantics (both expressions, eval and codegen paths): mismatched
  * vector lengths raise IllegalArgumentException — never a silent
  * truncation or an opaque ArrayIndexOutOfBounds from generated code. A
  * zero-norm input to cosine yields NaN (0/0 under IEEE double division,
  * identical to the SQL HOF fold it replaces); callers that want null
  * instead should wrap with `nanvl(..., lit(null))`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // elements are read IN PLACE via ArrayData.getFloat — toFloatArray()
  // allocated and copied both vectors on EVERY evaluation, which dominates
  // a pair scan (an O(n²) join evaluates the kernel per pair; the copies
  // made q_dedup_embcos allocation-bound). Accumulation order and values
  // are unchanged (getFloat(i) == toFloatArray()(i) for non-null elements;
  // the fixture arrays carry none).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) throw new IllegalArgumentException(
      s"graft_cosine: vector length mismatch ($n vs ${ys.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = xs.getFloat(i).toDouble; val y = ys.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_cosine: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i); double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of a float vector against a double vector (the SRP-LSH
  * signature kernel) or another float vector (pairwise scoring when norms
  * are precomputed out of the join — each element promoted to double
  * before multiply, the same arithmetic as the HOF/oracle fold). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<float>, array<double|float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def rightIsDouble: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  // in-place ArrayData reads for the same reason as CosineSimilarity:
  // per-pair toFloatArray()/toDoubleArray() copies dominated the O(n²)
  // scans this kernel exists for. Same fold order, same values.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) throw new IllegalArgumentException(
      s"graft_dot: vector length mismatch ($n vs ${ys.numElements()})")
    var dot = 0.0; var i = 0
    if (rightIsDouble) {
      while (i < n) { dot += xs.getFloat(i).toDouble * ys.getDouble(i); i += 1 }
    } else {
      while (i < n) { dot += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val yGet = if (rightIsDouble) "getDouble" else "getFloat"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += ((double) $a.getFloat($i)) * ((double) $b.$yGet($i));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The fixed SRP hyperplane matrix (64 Gaussian planes × 64 dims, seeded —
  * identical across runs/executors; fill order matches the historical
  * per-plane generation so signatures are stable across versions). Held
  * once per JVM and referenced by name from generated code — the plane
  * matrix is never shipped per-row or per-task. */
object SrpPlanes {
  val NumPlanes = 64
  val Dim = 64
  val planes: Array[Double] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NumPlanes * Dim)(rnd.nextGaussian())
  }
  /** All 64 plane dots in ONE pass over the input vector: bit p of the
    * result is sign(v · plane_p). Called from both eval and generated
    * code (Scala objects emit static forwarders, so the generated Java
    * calls this directly). */
  def signature(xs: Array[Float]): Long = {
    if (xs.length != Dim) throw new IllegalArgumentException(
      s"graft_srp_sig: expected $Dim-dim vector, got ${xs.length}")
    var sig = 0L
    var p = 0
    while (p < NumPlanes) {
      var dot = 0.0; var i = 0; val off = p * Dim
      while (i < Dim) { dot += xs(i).toDouble * planes(off + i); i += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** 64-bit SRP (signed-random-projection) signature of an array<float>
  * column as a single expression: one array materialization and one fused
  * loop for all 64 hyperplane dots, vs 64 separate DotProduct expressions
  * each re-reading the vector (measured ~2x on the LSH signature stage). */
case class SrpSignature(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sig expects array<float>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_srp_sig"

  override def nullSafeEval(a: Any): Any =
    SrpPlanes.signature(a.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SrpPlanes.signature($a.toFloatArray());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel for [[Int8Codes]] — one pass for min/max and one for the
  * quantized code string, called from both eval and generated code (Scala
  * objects emit static forwarders). The arithmetic replicates the SQL
  * lambda formulation EXACTLY — (double)x - lmin, divided by the
  * precomputed (lmax-lmin)/255.0 step, +0.5, floor, clamp [0,255], -128 —
  * so the expression is a drop-in for the interpreted HOF with
  * bit-identical output (locked by VectorExprSpec). */
object Int8Quant {
  def codes(xs: Array[Float]): org.apache.spark.unsafe.types.UTF8String = {
    if (xs.length == 0) throw new IllegalArgumentException(
      "graft_int8_codes: empty vector")
    var lminF = xs(0); var lmaxF = xs(0); var i = 1
    while (i < xs.length) {
      if (xs(i) < lminF) lminF = xs(i)
      if (xs(i) > lmaxF) lmaxF = xs(i)
      i += 1
    }
    val lmin = lminF.toDouble; val lmax = lmaxF.toDouble
    if (lmax == lmin) throw new IllegalArgumentException(
      "graft_int8_codes: degenerate (constant) vector has no quantization range")
    val step = (lmax - lmin) / 255.0
    val sb = new java.lang.StringBuilder(xs.length * 4)
    i = 0
    while (i < xs.length) {
      if (i > 0) sb.append(',')
      val c = math.floor((xs(i).toDouble - lmin) / step + 0.5)
      val clamped = math.min(math.max(c, 0.0), 255.0).toInt - 128
      sb.append(clamped)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
}

/** Comma-joined int8 linear-quantization codes of an array<float> column
  * as a single codegen'd expression — the fused form of the
  * `transform(embedding, x -> …)` HOF lambda (CodegenFallback,
  * interpreted per element) + `array_join`: one array materialization,
  * one primitive loop, no per-element Catalyst eval. This is the "100 TB
  * form" the quantize query's scaladoc promised. */
case class Int8Codes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_int8_codes expects array<float>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_int8_codes"

  override def nullSafeEval(a: Any): Any =
    Int8Quant.codes(a.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Int8Quant.codes($a.toFloatArray());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Cosine similarity of two array<float> columns, as a codegen'd Column. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Dot product of an array<float> column with an array<double> column. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** 64-bit SRP signature of an array<float> column (see [[SrpSignature]]). */
  def srpSig(v: Column): Column =
    GraftSqlBridge.column(SrpSignature(GraftSqlBridge.expression(v)))

  /** Comma-joined int8 quantization codes of an array<float> column
    * (see [[Int8Codes]]). */
  def int8Codes(v: Column): Column =
    GraftSqlBridge.column(Int8Codes(GraftSqlBridge.expression(v)))
}
