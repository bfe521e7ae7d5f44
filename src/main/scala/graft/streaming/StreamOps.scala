package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the streaming surface (µs-precision timestamp). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Completed session emitted by the stateful sessionizer. */
case class SessionOut(user_id: Long, start_ms: Long, cnt: Long, dur_sec: Long)

/** Session state buffer: timestamps in epoch milliseconds. */
case class SessionBuf(start: Long, last: Long, cnt: Long)

/** SURVEY §2.8 streaming operators (q57/q58 — test-only surface, exercised
  * over MemoryStream in the ScalaTest suite; the batch twins live in
  * EventWindows). Works identically on batch and streaming DataFrames where
  * noted. */
object StreamOps {

  /** q54's logic, streaming-safe: tumbling 1h counts per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_val"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_val"))

  /** q57: watermarked dedup + windowed aggregation. Duplicate event_ids
    * arriving within the 1h watermark are dropped; rows later than the
    * watermark are discarded by the engine. */
  def dedupedHourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** q96 (test-only like q57/q58): watermarked STREAM-STREAM interval
    * join — each view pairs with the same user's purchases that land
    * within `withinMinutes` AFTER it (attribution semantics). Both sides
    * carry watermarks and the join condition bounds the time range on BOTH
    * ends, so the engine can expire buffered state — the requirement that
    * makes a stream-stream inner join viable on an unbounded stream
    * (state is O(events inside the watermark window) per side, partitioned
    * by the equi-key shuffle). Works identically on batch frames — the
    * spec asserts the twins agree. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 60): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("amount"))
      .withWatermark("purchase_ts", "1 hour")
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("amount"))
  }

  /** q58: custom stateful sessionization with flatMapGroupsWithState and an
    * event-time timeout — the GroupState surface. Sessions close when the
    * gap exceeds `gapMinutes` (emitted immediately) or when the watermark
    * passes last+gap (emitted by the timeout path).
    *
    * Scale: state is one small buffer per active user key, partitioned by
    * the shuffle on user_id; timeouts bound state size — the properties
    * that keep this viable on an unbounded 100 TB stream. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(uid: Long, it: Iterator[Event],
        state: GroupState[SessionBuf]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(b =>
          SessionOut(uid, b.start, b.cnt, (b.last - b.start) / 1000))
        state.remove()
        out.iterator
      } else {
        val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val done = scala.collection.mutable.ListBuffer[SessionOut]()
        var buf = state.getOption
        evs.foreach { e =>
          val t = e.ts.getTime
          buf = buf match {
            case Some(b) if t - b.last <= gapMs =>
              Some(b.copy(last = math.max(b.last, t), cnt = b.cnt + 1))
            case Some(b) =>
              done += SessionOut(uid, b.start, b.cnt, (b.last - b.start) / 1000)
              Some(SessionBuf(t, t, 1))
            case None => Some(SessionBuf(t, t, 1))
          }
        }
        buf.foreach { b =>
          state.update(b)
          state.setTimeoutTimestamp(b.last + gapMs)
        }
        done.iterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
