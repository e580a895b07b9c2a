package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency aggregate over Spark's own mergeable
  * `org.apache.spark.util.sketch.CountMinSketch` — the frequency twin of
  * [[HllDistinct]]'s distinct-count sketch.
  *
  * Why: exact per-token counts over a 100 TB corpus need a shuffle keyed by
  * token (unbounded key space, heavy skew on stopwords). A CMS buffer is
  * fixed-size (depth × width counters), aggregates partially map-side,
  * ships compactly over the shuffle, and merges by counter addition — so
  * per-group/per-day sketches can be persisted and rolled up later without
  * rescanning. Counters are sums, so the result is merge-order-INDEPENDENT:
  * byte-identical output at any partitioning (tested), unlike most sketches.
  * Estimates overcount only (within eps·N at the configured confidence),
  * never undercount.
  */
case class CmsSketchAgg(
    child: Expression,
    eps: Double = 0.001,
    confidence: Double = 0.99,
    seed: Int = 7,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_sketch"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buffer.add(v.asInstanceOf[UTF8String].toString)
      case LongType => buffer.addLong(v.asInstanceOf[Long])
      case _ => buffer.add(v.toString)
    }
    buffer
  }

  override def merge(buffer: CountMinSketch, input: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(input)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CmsSketchAgg {
  /** CMS of a column's values, as an aggregate Column yielding the
    * serialized sketch (persist it, merge it later, or probe it with
    * [[estimate]]). */
  def cmsSketch(c: Column, eps: Double = 0.001, confidence: Double = 0.99): Column =
    GraftSqlBridge.column(
      CmsSketchAgg(GraftSqlBridge.expression(c), eps, confidence).toAggregateExpression())

  /** Estimated frequency of `key` in a serialized sketch. Deserializes per
    * call — fine for probing a handful of (group, key) pairs; a scan-scale
    * consumer should deserialize once per partition instead. */
  def estimate(bytes: Array[Byte], key: String): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(key)
}
