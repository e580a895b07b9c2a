package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Shared Bloom kernel: deterministic double hashing (Kirsch–Mitzenmacher,
  * h_i = h1 + i·h2) over a byte-granular bitmap. Byte-granular so the
  * serialized form IS the buffer — no endianness coupling between the
  * build side and the probe side, and partial-aggregate merge is a plain
  * byte OR. The mixer is the splitmix64 finalizer (public constants), so
  * the filter is bit-identical across runs, partitionings, and engines.
  */
object BloomProbe {
  /** splitmix64 finalizer — full avalanche, deterministic. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k bit positions for `key` in a power-of-two-bit bitmap. */
  def set(bits: Array[Byte], key: Long, numHashes: Int): Unit = {
    val mask = (bits.length.toLong << 3) - 1
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i.toLong * h2) & mask
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7).toInt)).toByte
      i += 1
    }
  }

  /** Probe: true iff every one of `key`'s k bit positions is set (i.e.
    * the key MIGHT be in the set; false is definite absence). */
  def contains(bits: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val mask = (bits.length.toLong << 3) - 1
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i.toLong * h2) & mask
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom-filter build aggregate: the runtime-filter primitive for
  * 100 TB joins. When the dimension side of a shuffle join is too big to
  * broadcast as ROWS, its key set still broadcasts as BITS (~1.2 bytes/key
  * at 1% FP): build this filter over the dim keys, broadcast the one-row
  * result, and pre-filter the fact side BEFORE its shuffle — false
  * positives are removed by the exact join that follows, so the rewrite is
  * semantics-preserving while cutting the dominant shuffle by the fact's
  * miss rate. Partial aggregation works map-side (byte-OR merge), so the
  * build itself never concentrates rows.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits >>> 3)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomProbe.set(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | input(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Codegen'd Bloom membership probe — `contains(filterBytes, key)`. Stays
  * inside whole-stage codegen (a static call into [[BloomProbe]]), so the
  * fact-side pre-filter adds no codegen boundary on the hot path. */
case class BloomContains(
    left: Expression,
    right: Expression,
    numHashes: Int = 5)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomProbe.contains(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomProbe.contains($b, $k, $numHashes)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BloomFilter {
  /** Build a Bloom filter over a LONG key column, as an aggregate Column
    * yielding the serialized bitmap (binary). */
  def bloomAgg(c: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    GraftSqlBridge.column(
      BloomAgg(GraftSqlBridge.expression(c), numBits, numHashes).toAggregateExpression())

  /** Probe a built filter for a key's possible membership. */
  def bloomContains(bloom: Column, key: Column, numHashes: Int = 5): Column =
    GraftSqlBridge.column(BloomContains(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(key), numHashes))
}
