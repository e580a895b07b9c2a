package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF: per-group top-k by (score desc, key asc) with a bounded
  * buffer (SURVEY.md §2 B.11 q_udaf_topk).
  *
  * The buffer never exceeds k elements, so partial aggregation ships at
  * most k rows per group per partition over the shuffle — the scalable
  * top-k shape (contrast: sorting whole groups). Merge is associative and
  * commutative; the (score, key) tiebreak makes results deterministic.
  */
case class ScoredKey(score: Double, key: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {

  private def best(xs: Seq[ScoredKey]): Seq[ScoredKey] =
    xs.sortBy(x => (-x.score, x.key)).take(k)

  override def zero: Seq[ScoredKey] = Nil
  override def reduce(buf: Seq[ScoredKey], a: ScoredKey): Seq[ScoredKey] =
    best(buf :+ a)
  override def merge(b1: Seq[ScoredKey], b2: Seq[ScoredKey]): Seq[ScoredKey] =
    best(b1 ++ b2)
  override def finish(r: Seq[ScoredKey]): Seq[ScoredKey] = r
  override def bufferEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
}
