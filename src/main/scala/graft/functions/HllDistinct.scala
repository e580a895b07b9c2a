package graft.functions

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HLL distinct-count aggregate backed by Apache DataSketches (SURVEY.md
  * §2 B.11's optional `TypedImperativeAggregate`, built).
  *
  * Why beyond `approx_count_distinct`: a DataSketches HLL buffer is a
  * standard, mergeable, storable sketch — at 100 TB the pattern is to
  * persist per-partition/per-day sketches and merge them later (rollups
  * across time windows without rescanning), which Spark's built-in HLL++
  * buffers don't offer as a stable external format. The buffer ships
  * compactly over the shuffle (partial aggregation) and unions losslessly.
  */
case class HllDistinct(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_distinct"

  override def createAggregationBuffer(): HllSketch =
    new HllSketch(lgK, TgtHllType.HLL_8)

  override def update(buffer: HllSketch, input: org.apache.spark.sql.catalyst.InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case other => buffer.update(v.toString)
    }
    buffer
  }

  override def merge(buffer: HllSketch, input: HllSketch): HllSketch = {
    val u = new Union(lgK)
    u.update(buffer)
    u.update(input)
    u.getResult(TgtHllType.HLL_8)
  }

  override def eval(buffer: HllSketch): Any =
    Math.round(buffer.getEstimate)

  override def serialize(buffer: HllSketch): Array[Byte] =
    buffer.toUpdatableByteArray

  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllDistinct {
  /** Sketch-based distinct count of a column, as an aggregate Column. */
  def hllDistinct(c: Column, lgK: Int = 12): Column =
    GraftSqlBridge.column(
      HllDistinct(GraftSqlBridge.expression(c), lgK).toAggregateExpression())
}
