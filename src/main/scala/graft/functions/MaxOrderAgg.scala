package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Input/buffer for the max-by Aggregator: (price, orderkey). */
case class OrderPick(price: Double, key: Long)

/** q26 typed-UDAF surface (SURVEY §2.4): arg-max with a deterministic
  * tiebreak — the order key of the highest-priced order; on equal price the
  * larger key wins. Associative + commutative, so Spark can partial-aggregate
  * map-side and merge across partitions (the 100 TB safety property).
  * Register with `functions.udaf(MaxOrderAgg)`. */
object MaxOrderAgg extends Aggregator[OrderPick, OrderPick, Long] {
  def zero: OrderPick = OrderPick(Double.NegativeInfinity, Long.MinValue)
  def reduce(b: OrderPick, a: OrderPick): OrderPick =
    if (a.price > b.price || (a.price == b.price && a.key > b.key)) a else b
  def merge(x: OrderPick, y: OrderPick): OrderPick = reduce(x, y)
  def finish(r: OrderPick): Long = r.key
  def bufferEncoder: Encoder[OrderPick] = Encoders.product[OrderPick]
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
