package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KLL streaming-quantile aggregate backed by Apache DataSketches — the
  * mergeable twin of `approx_percentile`, completing the sketch family
  * next to [[HllDistinct]] (cardinality) and [[CmsSketchAgg]] (frequency).
  *
  * Why beyond `approx_percentile`: KLL buffers are a standard, mergeable,
  * STORABLE sketch with a proven a-priori rank-error bound (~1.65% at the
  * default k=200, 99% confidence) — at 100 TB the pattern is per-partition
  * / per-day sketches persisted once and merged for any later rollup
  * (weekly p99 latency from daily sketches, never a rescan), which
  * Spark's internal percentile buffers don't offer as a stable external
  * format. The buffer ships compactly over the shuffle (map-side partial
  * aggregation), merge is associative and lossless in rank error.
  *
  * The quantile returned is an ELEMENT of the data (inclusive search
  * criteria), not an interpolation. Compaction is randomized by design,
  * so results carry rank error across runs — the query using this is
  * declared no-oracle and property-tested against the exact percentile.
  */
case class KllQuantile(
    child: Expression,
    rank: Double,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(rank >= 0.0 && rank <= 1.0, s"rank must be in [0,1], got $rank")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kll_quantile"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, input: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.getQuantile(rank)

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KllQuantile {
  /** Sketch-based quantile of a double column at the given rank. */
  def kllQuantile(c: Column, rank: Double, k: Int = 200): Column =
    GraftSqlBridge.column(
      KllQuantile(GraftSqlBridge.expression(c), rank, k).toAggregateExpression())
}
