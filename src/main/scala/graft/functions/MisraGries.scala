package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded-memory frequency-summary buffer (a Product, so
  * Encoders.product applies); the map never exceeds the aggregator's
  * `capacity` keys. */
case class MGBuf(counts: Map[String, Long])

/** Misra–Gries heavy-hitter summary as a typed Aggregator — the
  * MERGEABLE bounded-memory frequency sketch (Misra & Gries 1982;
  * merge with the same error bound: Agarwal et al., "Mergeable
  * Summaries", PODS 2012). The buffer holds at most `capacity`
  * counters, so Spark's map-side partial aggregation
  * (ObjectHashAggregate) reduces each partition to ONE capacity-bounded
  * map before the shuffle — a global value-frequency pass over 100 TB
  * moves O(partitions × capacity) map entries, never |vocabulary|, and
  * no executor ever holds more than `capacity` counters.
  *
  * Guarantees, for N processed rows under ANY merge tree (suite-pinned
  * by ScalaCheck over arbitrary corpora and partition layouts):
  *  - UNDERCOUNT ONLY: est(key) ≤ true(key), and
  *    true(key) − est(key) ≤ N / (capacity + 1);
  *  - COVERAGE: every key with true(key) > N / (capacity + 1) is in the
  *    summary (its counter cannot be driven to zero).
  * The kept key set BELOW that frequency line is partition-layout
  * dependent (inherent to MG/SpaceSaving-family sketches), so
  * registry-facing outputs re-count the surviving candidates exactly
  * instead of exposing raw estimates — see
  * graft.api.GraftOps.heavyHittersTwoPass. */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[String, MGBuf, Map[String, Long]] {
  require(capacity >= 1, "capacity must be positive")

  def zero: MGBuf = MGBuf(Map.empty)

  def reduce(b: MGBuf, key: String): MGBuf = {
    val c = b.counts
    c.get(key) match {
      case Some(v) => MGBuf(c.updated(key, v + 1L))
      case None if c.size < capacity => MGBuf(c.updated(key, 1L))
      case None =>
        // the classic MG step: the unrecorded key and every live counter
        // each give up one — counters at 1 vanish, the key is absorbed
        MGBuf(c.collect { case (k, v) if v > 1L => k -> (v - 1L) })
    }
  }

  def merge(x: MGBuf, y: MGBuf): MGBuf = {
    val sum = y.counts.foldLeft(x.counts) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= capacity) MGBuf(sum)
    else {
      // mergeable-summaries reduction: subtract the (capacity+1)-th
      // largest counter from every counter and drop the non-positive —
      // at most `capacity` survive, and the total subtracted over any
      // merge tree stays within the N/(capacity+1) bound (PODS'12)
      val t = sum.valuesIterator.toArray
        .sorted(Ordering[Long].reverse).apply(capacity)
      MGBuf(sum.collect { case (k, v) if v > t => k -> (v - t) })
    }
  }

  def finish(b: MGBuf): Map[String, Long] = b.counts
  def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
