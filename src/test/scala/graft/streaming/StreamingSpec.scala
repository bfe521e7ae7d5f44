package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.engine.SparkTestBase

/** SURVEY §5.2.5 — streaming twins over MemoryStream: batch≡stream for
  * windows, watermark dedup/late-drop (q57), stateful sessionization (q58). */
class StreamingSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixtureEvents = Seq(
    Event(0L, ts("2024-01-01 10:00:00"), 1L, "view", 10.0),
    Event(1L, ts("2024-01-01 10:10:00"), 1L, "click", 20.5),
    Event(2L, ts("2024-01-01 10:50:00"), 1L, "purchase", 99.99),
    Event(3L, ts("2024-01-01 10:05:00"), 2L, "view", 1.25),
    Event(4L, ts("2024-01-01 11:05:00"), 2L, "error", 0.75))

  test("q54 twin: tumbling window counts agree between batch and stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val batch = StreamOps.tumblingCounts(fixtureEvents.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val mem = MemoryStream[Event]
    val q = StreamOps.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(fixtureEvents)
      q.processAllAvailable()
      val stream = s.table("tumbling").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(stream === batch)
      assert(batch.contains((ts("2024-01-01 10:00:00"), "view", 2L)))
    } finally q.stop()
  }

  test("q57: duplicates within the watermark dedupe; late rows drop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.dedupedHourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      // event 0 arrives twice (same event_id) → must count once
      mem.addData(fixtureEvents :+ fixtureEvents.head)
      q.processAllAvailable()
      // advance the watermark far past 11:00 so both windows finalize,
      // then send a too-late row that must be discarded
      mem.addData(Event(100L, ts("2024-01-01 15:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(101L, ts("2024-01-01 10:01:00"), 1L, "view", 0.0)) // late
      mem.addData(Event(102L, ts("2024-01-01 15:30:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val out = s.table("dedup").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(out((ts("2024-01-01 10:00:00"), "view")) === 2L) // dup dropped, late dropped
      assert(out((ts("2024-01-01 11:00:00"), "error")) === 1L)
    } finally q.stop()
  }

  test("q59 twin: stream-static enrichment join against the customer dim") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val static = graft.engine.Tables.customer(s, fx)
    val mem = MemoryStream[Event]
    val joined = mem.toDF().join(static,
      org.apache.spark.sql.functions.col("user_id") ===
        org.apache.spark.sql.functions.col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val q = joined.writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(fixtureEvents)
      q.processAllAvailable()
      val out = s.table("enrich").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out("MACHINERY") === 3L) // user 1 = cust 1
      assert(out("AUTOMOBILE") === 2L) // user 2 = cust 2
    } finally q.stop()
  }

  test("conversation assembly over session windows: the Append stream " +
    "emits only watermark-final conversations and matches the batch twin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val convo = Seq(
      Event(0L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Event(1L, ts("2024-01-01 10:10:00"), 1L, "click", 0.0),
      // same instant as event 1 → part-order tiebreak ("click" < "apply")?
      Event(2L, ts("2024-01-01 10:10:00"), 1L, "apply", 0.0),
      Event(3L, ts("2024-01-01 11:30:00"), 1L, "purchase", 0.0), // new session
      Event(4L, ts("2024-01-01 10:05:00"), 2L, "view", 0.0))
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3))).toSet
    val batch = shape(StreamOps.assembleSessions(convo.toDF()).collect())
    assert(batch.contains((1L, ts("2024-01-01 10:00:00"),
      "view apply click", 3L)),
      "ts tie breaks on the part string (apply < click)")
    assert(batch.contains((1L, ts("2024-01-01 11:30:00"), "purchase", 1L)))
    assert(batch.contains((2L, ts("2024-01-01 10:05:00"), "view", 1L)))
    // null ts fails loudly on the batch twin (a null-window group would
    // otherwise silently swallow the row — the batch operator's contract)
    intercept[Exception] {
      StreamOps.assembleSessions(
        Seq((3L, None: Option[Timestamp], "view"))
          .toDF("user_id", "ts", "event_type")).collect()
    }

    // the scale claim, pinned: 10× the ingested volume at the SAME
    // concurrency leaves session-window state flat — state is (open
    // sessions in the watermark horizon), never (events ever seen).
    // Both volumes must simulate PAST the eviction plateau (user
    // window 50 min + gap 30 + watermark 10), hence ≥ 100 minutes.
    // The full decade with the engine-reported numbers is
    // `sbt "runMain graft.tools.StreamProbe"` (SCALING.md).
    val probe = graft.tools.StreamProbe.run(spark, Seq(5000, 50000),
      active = 50)
    assert(probe(0)._2 === probe(1)._2,
      s"peak state must not grow with ingested volume (got $probe)")
    assert(probe(1)._4 > probe(0)._4,
      "…while the sessions actually emitted DO grow with volume")

    val mem = MemoryStream[Event]
    val q = StreamOps.assembleSessions(mem.toDF())
      .writeStream.format("memory").queryName("convo")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(convo)
      q.processAllAvailable()
      // nothing is final yet (watermark still at minus infinity on the
      // first trigger's plan); push the watermark far past every close
      mem.addData(Event(100L, ts("2024-01-01 20:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val stream = shape(s.table("convo").collect())
      assert(batch.subsetOf(stream),
        "every batch conversation is emitted once watermark-final")
      assert(stream.subsetOf(batch +
        ((9L, ts("2024-01-01 20:00:00"), "view", 1L))),
        "the stream emits nothing the batch twin does not")
    } finally q.stop()
  }

  test("q58: flatMapGroupsWithState sessions match the batch lag-gap logic") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(fixtureEvents)
      q.processAllAvailable()
      // push the watermark past every open session's timeout
      mem.addData(Event(200L, ts("2024-01-01 20:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(201L, ts("2024-01-01 23:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val out = s.table("sessions").as[SessionOut].collect()
      val u1 = out.filter(_.user_id == 1L).map(o => (o.cnt, o.dur_sec)).sorted
      // user 1: [10:00,10:10] then 40-min gap → [10:50]
      assert(u1.contains((2L, 600L)))
      val u2 = out.filter(_.user_id == 2L)
      assert(u2.forall(o => o.cnt == 1L && o.dur_sec == 0L)) // 60-min gap splits
    } finally q.stop()
  }

  test("q58 sessionize holds sessions for late data: a late in-watermark " +
    "event BRIDGES two gap-separated buffers into one final session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // 31-min gap: an eager sessionizer would emit [10:00] immediately
      // and could never retract it
      mem.addData(Event(0L, ts("2024-01-01 10:00:00"), 5L, "view", 0.0),
        Event(1L, ts("2024-01-01 10:31:00"), 5L, "view", 0.0))
      q.processAllAvailable() // watermark = 10:21
      // late but admissible (>= watermark): bridges the two buffers
      mem.addData(Event(2L, ts("2024-01-01 10:25:00"), 5L, "view", 0.0))
      q.processAllAvailable()
      // flush the watermark past last+gap so the merged session finalizes
      mem.addData(Event(9L, ts("2024-01-01 12:00:00"), 99L, "view", 0.0))
      q.processAllAvailable()
      val u5 = s.table("late_sessions").as[SessionOut].collect()
        .filter(_.user_id == 5L)
      assert(u5.toSeq === Seq(SessionOut(5L,
        ts("2024-01-01 10:00:00").getTime, 3L, 31 * 60L)),
        "one session 10:00..10:31 with the bridging event counted")
    } finally q.stop()
  }

  test("q54/q56 twins over a checkpointed FILE source match batch") {
    // The real-deployment template the MemoryStream twins abstract over:
    // an events directory read with spark.readStream + explicit schema,
    // a checkpoint dir, bounded per-trigger file intake, and an
    // AvailableNow trigger that drains the backlog then stops cleanly.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src_").toString
    // two JSONL files → two micro-batches under maxFilesPerTrigger=1
    fixtureEvents.take(3).toDF().coalesce(1).write.json(s"$srcDir/f0")
    fixtureEvents.drop(3).toDF().coalesce(1).write.json(s"$srcDir/f1")
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(s"$srcDir/*/")

    def chk() = java.nio.file.Files.createTempDirectory("graft_stream_chk_").toString
    val qTumble = StreamOps.tumblingCounts(src)
      .writeStream.format("memory").queryName("file_tumbling")
      .option("checkpointLocation", chk())
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    val sessions = src
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("start"), col("cnt"))
    val qSession = sessions
      .writeStream.format("memory").queryName("file_sessions")
      .option("checkpointLocation", chk())
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(qTumble.awaitTermination(120000), "tumbling query did not drain")
      assert(qSession.awaitTermination(120000), "session query did not drain")
      val streamTumble = s.table("file_tumbling").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batchTumble = StreamOps.tumblingCounts(fixtureEvents.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamTumble === batchTumble)
      val streamSessions = s.table("file_sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(streamSessions === Set(
        (1L, ts("2024-01-01 10:00:00"), 2L),
        (1L, ts("2024-01-01 10:50:00"), 1L),
        (2L, ts("2024-01-01 10:05:00"), 1L),
        (2L, ts("2024-01-01 11:05:00"), 1L)))
    } finally { qTumble.stop(); qSession.stop() }
  }

  test("streaming profile upsert: foreachBatch drives the BaseModel write cycle") {
    // The reference's real-time profile update: a tag stream lands in
    // micro-batches, each batch merges into the bucket-partitioned profile
    // table via PortraitOps.profileUpsert — only touched buckets rewrite.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tableDir = java.nio.file.Files.createTempDirectory("graft_sprof_").toString + "/t"
    val mem = MemoryStream[Event]
    val q = mem.toDF()
      .select($"user_id".as("custkey"), $"event_type".as("tag"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.collect_set
        val perKey = batch.groupBy("custkey")
          .agg(collect_set("tag").as("tags"))
        graft.api.PortraitOps.profileUpsert(
          batch.sparkSession, tableDir, perKey, "custkey"): Unit
      }
      .outputMode(OutputMode.Append()).start()
    // batch 2 RE-TOUCHES user 1 (a "refund" tag) so the same key merges
    // across micro-batches, not just across users
    val extra = Event(5L, ts("2024-01-01 11:10:00"), 1L, "refund", -99.99)
    try {
      mem.addData(fixtureEvents.take(3)) // user 1: view, click, purchase
      q.processAllAvailable()
      mem.addData(fixtureEvents.drop(3) :+ extra) // user 2: view, error; user 1: refund
      q.processAllAvailable()
      val out = graft.api.PortraitOps.profileRead(s, tableDir).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      assert(out(1L) === List("click", "purchase", "refund", "view"))
      assert(out(2L) === List("error", "view"))
      // convergence: the stream-fed table equals the one-shot batch merge
      // of the same events (q51 semantics — order of arrival irrelevant)
      import org.apache.spark.sql.functions.{array_sort, collect_set}
      val batchMerge = (fixtureEvents :+ extra).toDF()
        .groupBy($"user_id").agg(array_sort(collect_set($"event_type")).as("tags"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      assert(out === batchMerge)
    } finally q.stop()
  }

  test("q96: watermarked stream-stream interval join matches the batch twin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // views at 10:00/10:10 (u1), 10:05 (u2); purchase at 10:50 (u1) joins
    // BOTH u1 views (within 60 min); u2's 11:05 'error' is filtered out
    val views = fixtureEvents.filter(_.event_type == "view") :+
      Event(10L, ts("2024-01-01 10:10:00"), 1L, "view", 0.0)
    val purchases = fixtureEvents.filter(_.event_type == "purchase") :+
      Event(11L, ts("2024-01-01 11:20:00"), 2L, "purchase", 5.5)
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toSet

    val batch = shape(StreamOps.viewPurchaseJoin(views.toDF(), purchases.toDF()))
    assert(batch === Set((1L, 0L, 2L, 99.99), (1L, 10L, 2L, 99.99)))

    val vMem = MemoryStream[Event]
    val pMem = MemoryStream[Event]
    val q = StreamOps.viewPurchaseJoin(vMem.toDF(), pMem.toDF())
      .writeStream.format("memory").queryName("vpjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      // feed across micro-batches: views first, purchases later — the
      // joined pair must still emit once both sides are buffered
      vMem.addData(views)
      q.processAllAvailable()
      pMem.addData(purchases)
      q.processAllAvailable()
      assert(shape(s.table("vpjoin")) === batch)
    } finally q.stop()
  }

  test("curation quality gate is streamable: repetitionStats over a stream " +
    "equals batch (stateless in-row projection, Append mode, no watermark)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "spam spam spam ham"),
      (2L, "one"),
      (3L, "x y x y x y"))
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.api.TextAnalysis.repetitionStats(df, "id", "txt")
    val batch = gate(docs.toDF("id", "txt")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5))).toSet
    val mem = MemoryStream[(Long, String)]
    val q = gate(mem.toDF().toDF("id", "txt"))
      .writeStream.format("memory").queryName("quality_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs)
      q.processAllAvailable()
      val stream = s.table("quality_gate").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getInt(5))).toSet
      assert(stream === batch)
      // the gate itself: heavy repetition fails, clean text passes
      assert(batch.exists(t => t._1 == 0L && t._6 == 1))
      assert(batch.exists(t => t._1 == 1L && t._6 == 0))
    } finally q.stop()
  }

  test("chunking is streamable: chunkByTokens over a stream equals batch " +
    "(stateless explode, Append mode, no watermark)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y"))
    def chunk(df: org.apache.spark.sql.DataFrame) =
      graft.api.TextAnalysis.chunkByTokens(df, "text", 4, 1)
        .select("doc_id", "chunk_id", "tok_from", "tok_to", "chunk_text")
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val batch = shape(chunk(docs.toDF("doc_id", "text")).collect())
    val mem = MemoryStream[(Long, String)]
    val q = chunk(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunks")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs)
      q.processAllAvailable()
      assert(shape(s.table("chunks").collect()) === batch)
      assert(batch.contains((1L, 1L, 3L, 7L, "d e f g")))
    } finally q.stop()
  }

  test("incremental curation: streaming prefix (gate + watermarked exact " +
    "dedup) appends survivors via foreachBatch; the batch tail over them " +
    "equals the one-shot curate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.functions.{col, length}
    // d0=d1 byte-identical (split ACROSS micro-batches so first-arrival is
    // deterministic), d2 a near-dup of d0 (3-gram Jaccard 1/3), d3 fails
    // the top-word gate, d4 an unrelated singleton
    val d0 = (0L, "alpha beta gamma delta", ts("2024-01-01 10:00:00"))
    val d1 = (1L, "alpha beta gamma delta", ts("2024-01-01 10:05:00"))
    val d2 = (2L, "alpha beta gamma epsilon", ts("2024-01-01 10:10:00"))
    val d3 = (3L, "spam spam spam spam", ts("2024-01-01 10:15:00"))
    val d4 = (4L, "one two three four five six", ts("2024-01-01 10:20:00"))
    val corpus = Seq(d0, d1, d2, d3, d4)
    def frame(xs: Seq[(Long, String, Timestamp)]) =
      xs.toDF("doc_id", "text", "ts").withColumn("len", length(col("text")))

    val outDir = java.nio.file.Files.createTempDirectory("graft_scur_")
      .toString + "/survivors"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val streamIn = mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("len", length(col("text")))
    val q = graft.api.CurationPipeline.curateStream(streamIn, "text", "ts",
        maxTopWordRatio = 0.3) // 4-word docs have top ratio 0.25
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir): Unit
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Seq(d0))
      q.processAllAvailable()
      mem.addData(Seq(d1, d2, d3)) // d1 dups d0 across batches; d3 gated
      q.processAllAvailable()
      mem.addData(Seq(d4))
      q.processAllAvailable()
    } finally q.stop()
    val survivors = s.read.parquet(outDir)
    val got = survivors.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet
    assert(got === Set(0L -> d0._2, 2L -> d2._2, 4L -> d4._2),
      "gate drops d3, watermark dedup drops the later exact copy d1")
    // the prefix operator is a faithful batch twin (same texts survive)
    val batchPrefix = graft.api.CurationPipeline.curateStream(
        frame(corpus), "text", "ts", maxTopWordRatio = 0.3,
        idCol = Some("doc_id")).collect()
      .map(_.getAs[String]("text")).toSet
    assert(batchPrefix === got.map(_._2))
    // composition: batch tail over the STREAMED survivors == the one-shot
    // batch curate on the full corpus (gate and exact dedup are no-ops on
    // already-curated survivors, so the near-dup/cluster/split tail is
    // the only live work)
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("cluster"), r.getAs[Long]("cluster_size"),
        r.getAs[String]("split"))).toSet
    val viaStream = shape(graft.api.CurationPipeline.curate(
      survivors, "doc_id", "text", "len", maxTopWordRatio = 0.3, minPct = 30))
    val oneShot = shape(graft.api.CurationPipeline.curate(
      frame(corpus), "doc_id", "text", "len", maxTopWordRatio = 0.3, minPct = 30))
    assert(viaStream === oneShot)
    // and the near-dup tail actually fired: d0/d2 clustered, best len wins
    assert(oneShot.exists(t => t._1 == 2L && t._3 == 0L && t._4 == 2L))
  }

  test("curateIncremental drives a foreachBatch sink: per-micro-batch " +
    "against-history near-dedup equals the one-shot step") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.api.{CurationPipeline, GraftOps}
    val corpus = Seq(0L -> "alpha beta gamma delta epsilon")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_sci_").toString
    val dirRef = java.nio.file.Files.createTempDirectory("graft_scir_").toString
    GraftOps.fingerprintBuild(corpus, "doc_id", "text", dir)
    GraftOps.fingerprintBuild(corpus, "doc_id", "text", dirRef)
    val outDir = java.nio.file.Files.createTempDirectory("graft_scio_")
      .toString + "/survivors"
    val batch1 = Seq(
      10L -> "alpha beta gamma delta epsilon", // history dup → drop
      11L -> "spam spam spam spam", // gate-fail
      12L -> "one two three four five six seven") // novel
    val batch2 = Seq(
      20L -> "one two three four five six seven", // dups 12, indexed by then
      22L -> "totally new words here indeed") // novel
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        // the engine's own batch id feeds the replay watermark — the
        // production wiring of the idempotence mechanism
        CurationPipeline.curateIncremental(batch, "doc_id", "text", dir,
            maxTopWordRatio = 0.3, batchId = Some(bid))
          .write.mode("append").parquet(outDir): Unit
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = s.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = CurationPipeline.curateIncremental(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", dirRef,
        maxTopWordRatio = 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(streamed === oneShot && streamed === Set(12L, 22L),
      "micro-batched against-history curation must equal the one-shot step")
  }

  test("curateIncremental batchId: a force-replayed committed micro-batch " +
    "appends nothing twice and re-emits identical survivors; stale batch " +
    "ids fail loudly") {
    val s = spark
    import s.implicits._
    import graft.api.{CurationPipeline, GraftOps, IndexStore}
    val dir = java.nio.file.Files.createTempDirectory("graft_rp_").toString
    GraftOps.fingerprintBuild(
      Seq(0L -> "alpha beta gamma delta epsilon").toDF("doc_id", "text"),
      "doc_id", "text", dir)
    def step(rows: Seq[(Long, String)], b: Long) =
      CurationPipeline.curateIncremental(rows.toDF("doc_id", "text"),
          "doc_id", "text", dir, maxTopWordRatio = 0.3, batchId = Some(b))
        .collect().map(_.getLong(0)).toSet
    def docs() = IndexStore.readTable(s, dir,
        IndexStore.resolve(s, dir).get, "docs")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    val b1 = Seq(
      10L -> "alpha beta gamma delta epsilon", // history dup → drop
      12L -> "one two three four five six seven") // novel → survive
    assert(step(b1, 0L) === Set(12L))
    val docsAfter = docs()
    assert(docsAfter === Seq(0L, 10L, 12L),
      "the gated batch (drops included) is appended exactly once")
    val verAfter = IndexStore.resolve(s, dir).get.version
    // FORCE REPLAY: the engine re-runs batch 0 after a crash between the
    // step and the sink's checkpoint commit. Without the watermark the
    // replayed docs would meet their own fingerprints and emit zero
    // survivors; with it the step re-derives the first attempt exactly
    // and appends nothing.
    assert(step(b1, 0L) === Set(12L), "replay re-emits identical survivors")
    assert(docs() === docsAfter, "replay appends zero duplicate rows")
    assert(IndexStore.resolve(s, dir).get.version === verAfter,
      "replay publishes no new index version")
    // the next batch advances the watermark; a batch BELOW it is a
    // wiring bug and fails loudly
    assert(step(Seq(20L -> "totally new words here indeed"), 1L)
      === Set(20L))
    val e = intercept[IllegalArgumentException] { step(b1, 0L) }
    assert(e.getMessage.contains("watermark"))
  }

  test("indexVacuum is replay-safe by construction: a cron'd vacuum " +
    "between the crash and the replay retains the replay-base manifest " +
    "and segments, and the force-replayed batch still re-derives " +
    "identical survivors; the next batch releases the old base") {
    val s = spark
    import s.implicits._
    import graft.api.{CurationPipeline, GraftOps, IndexStore}
    val dir = java.nio.file.Files.createTempDirectory("graft_rpv_").toString
    GraftOps.fingerprintBuild(
      Seq(0L -> "alpha beta gamma delta epsilon").toDF("doc_id", "text"),
      "doc_id", "text", dir) // v1
    def step(rows: Seq[(Long, String)], b: Long) =
      CurationPipeline.curateIncremental(rows.toDF("doc_id", "text"),
          "doc_id", "text", dir, maxTopWordRatio = 0.3, batchId = Some(b))
        .collect().map(_.getLong(0)).toSet
    val b1 = Seq(
      10L -> "alpha beta gamma delta epsilon", // history dup → drop
      12L -> "one two three four five six seven") // novel → survive
    assert(step(b1, 0L) === Set(12L)) // v2, replay base = v1
    // compact so the vacuum has something to reclaim, then vacuum on the
    // worst-case cron schedule: between the (simulated) crash and the
    // engine's replay of batch 0
    GraftOps.fingerprintCompact(s, dir) // v3, watermark props carried
    val gone = GraftOps.indexVacuum(s, dir)
    assert(gone.exists(_.startsWith("v00002")),
      "the vacuum still reclaims the superseded append version")
    assert(IndexStore.resolveAt(s, dir, 1).isDefined,
      "the replay-base manifest survives any vacuum timing by construction")
    val ver = IndexStore.resolve(s, dir).get.version
    assert(step(b1, 0L) === Set(12L),
      "the replay after the vacuum re-emits identical survivors")
    assert(IndexStore.resolve(s, dir).get.version === ver,
      "the replay publishes no new version")
    // the next batch re-points the watermark at ITS pre-append manifest,
    // releasing the old base to the following vacuum — retention is one
    // manifest deep, not unbounded
    assert(step(Seq(20L -> "totally new words here indeed"), 1L)
      === Set(20L))
    GraftOps.indexVacuum(s, dir)
    assert(IndexStore.resolveAt(s, dir, 1).isEmpty,
      "a re-pointed watermark releases the old base manifest")
    assert(IndexStore.resolveAt(s, dir, 3).isDefined,
      "…and retains the new one")
  }

  test("dedupEmbAndAppend batchId: the embedding twin shares the replay " +
    "mechanism — identical survivors, no duplicate append") {
    val s = spark
    import s.implicits._
    import graft.api.{GraftOps, IndexStore}
    graft.GraftExtensions.register(s)
    val dir = java.nio.file.Files.createTempDirectory("graft_rpe_").toString
    GraftOps.srpIndexBuild(
      Seq(0L -> Array(1f, 0f, 0f)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir, dim = 3)
    def step(rows: Seq[(Long, Array[Float])], b: Long) =
      GraftOps.dedupEmbAndAppend(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", dir, minCosine = 0.9,
          batchId = Some(b))
        .collect().map(_.getLong(0)).toSet
    def docs() = IndexStore.readTable(s, dir,
        IndexStore.resolve(s, dir).get, "docs")
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val b1 = Seq(10L -> Array(1f, 0f, 0f), // dup of history → drop
      12L -> Array(0f, 1f, 0f)) // novel → survive
    assert(step(b1, 0L) === Set(12L))
    val after = docs()
    assert(after === Seq(0L, 10L, 12L))
    assert(step(b1, 0L) === Set(12L), "replay re-emits identical survivors")
    assert(docs() === after, "replay appends zero duplicate rows")
  }

  test("two-index composition: a crash between the text-index append and " +
    "the embedding-index append recovers through each index's OWN replay " +
    "watermark — the replayed batch converges to the no-crash state") {
    // The production pipeline that gates on BOTH near-dup families writes
    // two persistent indexes per micro-batch (text fingerprints, then
    // embedding sketches). A crash between the two appends leaves them
    // at different watermarks; on replay each index recovers
    // independently (text time-travels and skips its append, embedding
    // appends normally), so the composition needs no cross-index
    // transaction to be idempotent.
    val s = spark
    import s.implicits._
    import graft.api.{CurationPipeline, GraftOps, IndexStore}
    graft.GraftExtensions.register(s)
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon", Array(1f, 1f, 1f)), // text dup
      (11L, "eleven brand new words right here", Array(1f, 0f, 0f)), // emb dup
      (12L, "one two three four five six seven", Array(0f, 1f, 0f))) // novel
      .toDF("doc_id", "text", "embedding")
    def mkDirs(): (String, String) = {
      val t = java.nio.file.Files.createTempDirectory("graft_2ix_t_").toString
      val e = java.nio.file.Files.createTempDirectory("graft_2ix_e_").toString
      GraftOps.fingerprintBuild(
        Seq(0L -> "alpha beta gamma delta epsilon").toDF("doc_id", "text"),
        "doc_id", "text", t)
      GraftOps.srpIndexBuild(
        Seq(0L -> Array(1f, 0f, 0f)).toDF("doc_id", "embedding"),
        "doc_id", "embedding", e, dim = 3)
      (t, e)
    }
    // the composed step: text survivors feed the embedding step, one
    // batchId drives BOTH watermarks
    def step(tDir: String, eDir: String, b: Long): Set[Long] = {
      val tSurv = CurationPipeline.curateIncremental(
        batch.select("doc_id", "text"), "doc_id", "text", tDir,
        maxTopWordRatio = 0.3, batchId = Some(b))
      val eIn = batch.join(tSurv.select("doc_id"), "doc_id")
      GraftOps.dedupEmbAndAppend(eIn.select("doc_id", "embedding"),
          "doc_id", "embedding", eDir, minCosine = 0.9, batchId = Some(b))
        .collect().map(_.getLong(0)).toSet
    }
    def state(tDir: String, eDir: String): (Seq[Long], Seq[Long]) = (
      IndexStore.readTable(s, tDir, IndexStore.resolve(s, tDir).get, "docs")
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted,
      IndexStore.readTable(s, eDir, IndexStore.resolve(s, eDir).get, "docs")
        .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted)
    // reference: the no-crash run
    val (tRef, eRef) = mkDirs()
    val refOut = step(tRef, eRef, 0L)
    assert(refOut === Set(12L))
    assert(state(tRef, eRef) === (Seq(0L, 10L, 11L, 12L), Seq(0L, 11L, 12L)))
    // crashed run: the first attempt dies AFTER the text append, BEFORE
    // the embedding append (the text half alone is exactly that prefix)
    val (tDir, eDir) = mkDirs()
    CurationPipeline.curateIncremental(
      batch.select("doc_id", "text"), "doc_id", "text", tDir,
      maxTopWordRatio = 0.3, batchId = Some(0L)): Unit
    assert(IndexStore.resolve(s, eDir).get.props.get("last_batch").isEmpty,
      "precondition: the embedding index never saw batch 0")
    // the engine replays batch 0: text skips its append via the
    // watermark, embedding appends for the first time
    assert(step(tDir, eDir, 0L) === refOut,
      "the replayed batch emits the no-crash survivors")
    assert(state(tDir, eDir) === state(tRef, eRef),
      "both indexes converge to the no-crash state, nothing doubled")
    // both watermarks agree again — the next batch finds a consistent pair
    assert(IndexStore.resolve(s, tDir).get.props("last_batch") === "0")
    assert(IndexStore.resolve(s, eDir).get.props("last_batch") === "0")
  }

  test("curateStream resumes from its checkpoint: dedup state survives a " +
    "restart, drained files never re-emit") {
    // The production shape of incremental curation: a file-source stream
    // with a checkpoint, drained per run with AvailableNow. Run 2 must
    // (a) not re-emit run 1's survivors and (b) drop an exact duplicate
    // of a run-1 document VIA THE RESTORED STATE, not by re-reading it.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, length}
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = java.nio.file.Files.createTempDirectory("graft_cs_src_").toString
    val chkDir = java.nio.file.Files.createTempDirectory("graft_cs_chk_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cs_out_").toString + "/sv"
    def doc(id: Long, txt: String, t: String) = (id, txt, ts(t))
    def writeFile(n: String, xs: Seq[(Long, String, Timestamp)]): Unit =
      xs.toDF("doc_id", "text", "ts").coalesce(1).write.json(s"$srcDir/$n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    def drainOnce(): Unit = {
      val src = s.readStream.schema(schema).json(s"$srcDir/*/")
        .withColumn("len", length(col("text")))
      val q = graft.api.CurationPipeline.curateStream(src, "text", "ts",
          maxTopWordRatio = 0.3)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }
        .option("checkpointLocation", chkDir)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not drain")
      q.stop()
    }
    writeFile("f0", Seq(
      doc(0L, "alpha beta gamma delta", "2024-01-01 10:00:00"),
      doc(3L, "spam spam spam spam", "2024-01-01 10:01:00"))) // gated
    drainOnce()
    def survivors() = s.read.parquet(outDir).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(survivors() === Seq(0L))
    writeFile("f1", Seq(
      doc(1L, "alpha beta gamma delta", "2024-01-01 10:05:00"), // dup of run-1 d0
      doc(4L, "one two three four five six", "2024-01-01 10:06:00")))
    drainOnce()
    // d1 dropped by the RESTORED dedup state; d0 not re-emitted; d4 new
    assert(survivors() === Seq(0L, 4L))
  }

  test("q56 cross-check: native session_window() agrees with the lag-gap form") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val native = fixtureEvents.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("start"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // lag-gap expectation from the same fixture: user1 [10:00 x2], [10:50 x1];
    // user2 [10:05 x1], [11:05 x1]
    val expected = Set(
      (1L, ts("2024-01-01 10:00:00"), 2L),
      (1L, ts("2024-01-01 10:50:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), 1L),
      (2L, ts("2024-01-01 11:05:00"), 1L))
    assert(native === expected)
  }
}
