package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One (score, id) candidate for bounded top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Bounded buffer wrapper (a Product, so `Encoders.product` applies). */
case class TopKBuf(items: Seq[ScoredId])

/** Bounded top-k by (score desc, id asc) as a typed Aggregator.
  *
  * The buffer never exceeds `k` entries, so Spark's map-side partial
  * aggregation (ObjectHashAggregate) reduces each partition's candidates to
  * k per group BEFORE the shuffle: a groupBy over |corpus| candidate rows
  * per query moves only O(numPartitions × k) rows per query key instead of
  * the whole corpus. This is the two-stage top-k (per-partition heap →
  * global merge) that a window `row_number` cannot express — the window
  * would shuffle every candidate row to its group's reducer first.
  *
  * Ordering is total and deterministic: higher score wins, ties broken by
  * smaller id. `finish` emits the survivors already in rank order. */
class TopKAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]] {
  require(k >= 1, "k must be positive")

  private def wins(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    // a NaN score has NO rank (both > and == are false against it): it
    // would pass the full-buffer guard, prepend at rank 1, and evict a
    // real result — and make merge order-dependent. Drop it here, the
    // one place all candidates flow through.
    if (x.score.isNaN) buf
    else if (buf.length >= k && wins(buf.last, x)) buf
    else {
      val (hi, lo) = buf.span(wins(_, x))
      ((hi :+ x) ++ lo).take(k)
    }

  def zero: TopKBuf = TopKBuf(Vector.empty)
  def reduce(b: TopKBuf, a: ScoredId): TopKBuf = TopKBuf(insert(b.items, a))
  def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf(y.items.foldLeft(x.items)(insert))
  def finish(b: TopKBuf): Seq[ScoredId] = b.items
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
