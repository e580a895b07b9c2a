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

  /** Strict "ranks ahead of" order: score desc, key asc. NaN is outside
    * this order (`ahead` is false both ways for it), which would corrupt
    * the sorted-buffer invariant — so [[reduce]] rejects NaN rows at the
    * door and buffers are NaN-free by construction. */
  private def ahead(a: ScoredKey, b: ScoredKey): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  override def zero: Seq[ScoredKey] = Nil

  // buffers stay sorted by (score desc, key asc); a full buffer rejects
  // non-qualifying rows in O(1) and inserts in O(k) — no per-row re-sort
  override def reduce(buf: Seq[ScoredKey], a: ScoredKey): Seq[ScoredKey] =
    if (a.score.isNaN) buf // NaN can never rank: see ahead()
    else if (buf.length == k && !ahead(a, buf.last)) buf
    else {
      val (pre, post) = buf.span(ahead(_, a))
      (pre ++ (a +: post)).take(k)
    }

  // linear merge of two sorted buffers, bounded at k
  override def merge(b1: Seq[ScoredKey], b2: Seq[ScoredKey]): Seq[ScoredKey] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredKey]
    var i = 0; var j = 0
    while (out.length < k && (i < b1.length || j < b2.length)) {
      if (j >= b2.length || (i < b1.length && ahead(b1(i), b2(j)))) {
        out += b1(i); i += 1
      } else { out += b2(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(r: Seq[ScoredKey]): Seq[ScoredKey] = r
  override def bufferEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
}
