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

/** One not-yet-final session: timestamps in epoch MICROSECONDS (the
  * event's full precision — ms truncation would merge sessions whose gap
  * differs from the boundary by sub-ms amounts that the batch twin,
  * computing on exact longs, splits). */
case class SessionBuf(start: Long, last: Long, cnt: Long)

/** Sessionizer state: every session not yet provably final, sorted by
  * start. A session is FINAL only once the watermark passes last + gap —
  * until then a late event can extend it or BRIDGE it with its neighbor,
  * so gap-closed sessions are held here rather than emitted eagerly
  * (Append-mode rows are immutable; early emission of a later-bridged
  * session would leave overlapping wrong rows in the sink). */
case class SessionizerState(bufs: Seq[SessionBuf])

/** SURVEY §2.8 streaming operators (q57/q58 — test-only surface, exercised
  * over MemoryStream in the ScalaTest suite; the batch twins live in
  * EventWindows). Works identically on batch and streaming DataFrames where
  * noted. */
object StreamOps {

  /** q54's logic, streaming-safe: tumbling 1h counts per event type
    * (money through decSum — the engine-wide DECIMAL parity rule, so
    * micro-batch/partial-agg order can never float-noise the sum). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.engine.Tables.decSum(col("value")).as("sum_val"))
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
        // strictly AFTER the view — the funnel twin's ordering; a
        // same-instant purchase is not attributable to the view
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("amount"))
  }

  /** Streaming document assembly — [[graft.api.GraftOps.assembleDocs]]'s
    * streaming twin over SESSION windows (test-only surface like
    * q57/q58): each user's events within a `gapMinutes` session window
    * assemble into one conversation document, parts joined in
    * (ts, part) order. Emitted only once the watermark passes the
    * session's close (Append mode): an assembled conversation is
    * immutable in the sink, so it must not emit while a late in-horizon
    * event could still extend or bridge its session — the same
    * final-only stance as the q58 sessionizer, but on the engine's own
    * session_window state instead of custom GroupState. Null parts fail
    * loudly (the batch operator's contract — array_join would silently
    * drop text). Works identically on batch frames; the spec asserts
    * the twins agree.
    *
    * Scale: state per open session is the collected parts — inherent (a
    * document must fit in memory to exist; cap runaway sources upstream
    * with [[graft.api.GraftOps.capPerGroup]]), bounded in TIME by the
    * watermark horizon and partitioned by the user_id shuffle. */
  def assembleSessions(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame = {
    // family-standard reserved-column guard (the batch twin's): an input
    // column named like an emitted one would be silently dropped by the
    // aggregate and replaced by a same-named, different-meaning column
    val clash = events.columns.toSeq.intersect(Seq("text", "n_parts"))
    require(clash.isEmpty,
      s"assembleSessions emits columns text, n_parts; input column(s) " +
        s"${clash.mkString(", ")} collide — rename before assembling")
    val part = when(col("event_type").isNull,
        raise_error(lit("assembleSessions: null part 'event_type'")))
      .otherwise(col("event_type"))
    // null ts fails loudly like the batch twin's order guard. Placement
    // matters twice over: the guard must be folded into the ts COLUMN
    // ITSELF by a projection BEFORE the watermark/window — (a)
    // session_window inserts its own isnotnull filter ahead of the
    // aggregation, so a guard in the aggregate's fields would never
    // evaluate (the null row is silently pre-dropped — the exact
    // silent loss this guard exists to prevent), and (b) wrapping the
    // grouping expression instead would detach the watermark from the
    // window column and fail streaming analysis. A watermark on the
    // guarded derived column works for both engines' paths.
    val guarded = events.withColumn("ts",
      when(col("ts").isNull,
        raise_error(lit("assembleSessions: null order 'ts'")))
        .otherwise(col("ts")))
    val src =
      if (guarded.isStreaming) guarded.withWatermark("ts", watermark)
      else guarded
    src
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"),
        col("user_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("ts").as("o"), part.as("p")))),
          x => x.getField("p")), " ").as("text"),
        count(lit(1)).as("n_parts"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("text"), col("n_parts"))
  }

  /** q58: custom stateful sessionization with flatMapGroupsWithState and
    * an event-time timeout — the GroupState surface. A session is emitted
    * only once the WATERMARK passes its last event + gap: until then a
    * late event (within the watermark) can still extend it, LOWER its
    * start, or bridge two gap-separated buffers into one — so the state
    * holds every not-yet-final session and coalesces on each arrival,
    * and Append-mode rows are only ever emitted final. Gap arithmetic is
    * on epoch MICROSECONDS (the event's full precision, matching the
    * batch twin's exact-long comparisons at gap boundaries).
    *
    * Scale: state is the per-user list of sessions inside the watermark
    * horizon (bounded: anything older than watermark − gap is emitted
    * and removed on the next trigger), partitioned by the user_id
    * shuffle; timeouts bound state lifetime — the properties that keep
    * this viable on an unbounded 100 TB stream. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    // insert each event as a singleton, keep sorted, coalesce neighbors
    // within gap (a bridging event merges its two neighbors' counts)
    def coalesce(sorted: Seq[SessionBuf]): Seq[SessionBuf] =
      sorted.foldLeft(Vector.empty[SessionBuf]) { (acc, b) =>
        acc.lastOption match {
          case Some(p) if b.start - p.last <= gapUs =>
            acc.init :+ SessionBuf(p.start, math.max(p.last, b.last),
              p.cnt + b.cnt)
          case _ => acc :+ b
        }
      }

    def fn(uid: Long, it: Iterator[Event],
        state: GroupState[SessionizerState]): Iterator[SessionOut] = {
      var bufs = state.getOption.map(_.bufs).getOrElse(Vector.empty)
      if (!state.hasTimedOut) {
        val news = it.map(e => SessionBuf(micros(e.ts), micros(e.ts), 1L))
          .toVector
        bufs = coalesce((bufs ++ news).sortBy(b => (b.start, b.last)))
      }
      // final iff the watermark passed last + gap: any still-admissible
      // event (t ≥ watermark) would land strictly after the session
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val (ready, live) = bufs.partition(_.last + gapUs < wmUs)
      if (live.isEmpty) state.remove()
      else {
        state.update(SessionizerState(live))
        // wake when the earliest live session can become final (ceil to
        // the engine's ms watermark grid)
        state.setTimeoutTimestamp(
          (live.map(_.last).min + gapUs) / 1000 + 1)
      }
      ready.sortBy(_.start).iterator.map(b =>
        SessionOut(uid, b.start / 1000, b.cnt, (b.last - b.start) / 1000000))
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
