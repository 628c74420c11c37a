package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Structured Streaming over the events data: the streaming hourly
  * aggregation must agree with its batch equivalent (same plan over the
  * same files), the watermark must be set, and incremental file arrival
  * must accumulate.
  */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg over event files matches batch result") {
    // stage a copy of the sf0.001 events parquet as a streaming source dir
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val q = EventStream.runToMemory(spark, dir.toString, "stream_hourly")
    try {
      val streamed = spark.table("stream_hourly")
        .orderBy("window_start", "event_type").collect()
      val batch = EventStream.hourlyAggBatch(spark, dir.toString)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.nonEmpty)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("late-arriving file accumulates into the aggregation") {
    val dir = Files.createTempDirectory("graft-stream2")
    Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val q = EventStream.runToMemory(spark, dir.toString, "stream_inc")
    try {
      val n1 = spark.table("stream_inc").agg(sum("n")).head.getLong(0)
      // second batch of files arrives
      Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        dir.resolve("part-1.parquet"))
      q.processAllAvailable()
      val n2 = spark.table("stream_inc").agg(sum("n")).head.getLong(0)
      assert(n2 === n1 * 2)
    } finally q.stop()
  }

  test("stateful sessionizer closes gap-based sessions as watermark advances") {
    val dir = Files.createTempDirectory("graft-stream4")
    Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val q = EventStream.sessionize(EventStream.source(spark, dir.toString))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions").start()
    try {
      q.processAllAvailable()
      // second batch advances the watermark past most sessions' gap
      Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        dir.resolve("part-1.parquet"))
      q.processAllAvailable()
      val sessions = spark.table("stream_sessions").collect()
      assert(sessions.nonEmpty, "no sessions closed")
      assert(sessions.forall(r =>
        r.getAs[Long]("session_start") <= r.getAs[Long]("session_end") &&
          r.getAs[Long]("n_events") > 0))
      // duplicated input (same file twice) doubles events per point in
      // time, never session count: closed sessions stay plausible vs the
      // batch sessionization bound
      val users = sessions.map(_.getAs[Long]("user_id")).distinct
      assert(users.length > 1)
    } finally q.stop()
  }

  test("sessionizer survives a late event whose gap timeout trails the watermark") {
    // Regression guard: EventTimeTimeout throws if a state timeout is set
    // at/behind the current watermark, so sessionize clamps the timeout to
    // watermark + 1. Spark 4.x additionally filters below-watermark rows
    // before flatMapGroupsWithState (late-record filtering for stateful
    // operators), so the late event must neither crash the query (the
    // clamp) nor open a session (the filter) — this pins both behaviors.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val q = EventStream.sessionize(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("late_sessions").start()
    try {
      input.addData((1L, ts("10:00")), (2L, ts("12:30")))
      q.processAllAvailable() // watermark advances to ~11:30
      // user 3 is behind the watermark: 10:40 + 30min gap = 11:10 < 11:30
      input.addData((3L, ts("10:40")))
      q.processAllAvailable() // pre-fix: IllegalArgumentException here
      // advance far enough to time every session out
      input.addData((4L, ts("15:00")))
      q.processAllAvailable()
      input.addData((5L, ts("18:00")))
      q.processAllAvailable()
      val users = spark.table("late_sessions").collect()
        .map(_.getAs[Long]("user_id")).toSet
      assert(users.contains(1L) && users.contains(2L),
        s"expected users 1 and 2 to close sessions, got $users")
      assert(!users.contains(3L),
        s"below-watermark event must not open a session, got $users")
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("event_id", "ts")
    val q = EventStream.dedupStream(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      input.addData((1L, ts("10:00")), (2L, ts("10:05")))
      q.processAllAvailable()
      // duplicate of id 1 in a later batch, still within the watermark
      input.addData((1L, ts("10:10")), (3L, ts("10:20")))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect()
        .map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted === Seq(1L, 2L, 3L)) // each id exactly once
      assert(ids.count(_ == 1L) === 1)
    } finally q.stop()
  }

  test("streaming dedup drops BELOW-watermark duplicates as late (never re-emits)") {
    // the property e06b's multi-trigger oracle rests on: once the watermark
    // passes an event's timestamp, a replayed duplicate is filtered as late
    // input — it must not be re-emitted even though its dedup state may
    // already be evicted
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("event_id", "ts")
    val q = EventStream.dedupStream(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_late_stream").start()
    try {
      input.addData((1L, ts("10:00")), (2L, ts("10:05")))
      q.processAllAvailable()
      // advance the watermark far past 10:00 + 1h tolerance
      input.addData((3L, ts("13:00")))
      q.processAllAvailable()
      // duplicate of id 1 (state evicted, ts below watermark) and a FRESH
      // id also below the watermark: both must be dropped as late
      input.addData((1L, ts("10:00")), (4L, ts("10:30")))
      q.processAllAvailable()
      val ids = spark.table("dedup_late_stream").collect()
        .map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted === Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("streaming micro-batches land one row each in the observability table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val ctx = new graft.exec.ExecutionContext(spark)
    val listener = ctx.observeStreams()
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStream.dedupStream(input.toDF().toDF("event_id", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("obs_stream").start()
    try {
      input.addData((1L, ts("10:00")), (2L, ts("10:05")))
      q.processAllAvailable()
      input.addData((3L, ts("10:10")), (4L, ts("10:15")), (5L, ts("10:20")))
      q.processAllAvailable()
      q.stop()
      // the listener bus is asynchronous — wait for the progress events
      val deadline = System.nanoTime() + 30L * 1000000000L
      def streamRows() = ctx.observability.records
        .filter(_.getString(1) == "stream:obs_stream")
      while (streamRows().size < 2 && System.nanoTime() < deadline)
        Thread.sleep(100)
      val rows = streamRows()
      // one row per micro-batch: the two data batches carry their input
      // row counts (watermark-advance no-data batches may add rows=0 rows).
      // records are schemaless GenericRows — use schema positions
      // (request_id 0, path 1, duration_ms 4, rows 5)
      val counts = rows.map(_.getLong(5))
      assert(counts.contains(2L) && counts.contains(3L),
        s"expected batches with 2 and 3 input rows, got $counts")
      // request ids carry query id + batch id; durations are real
      assert(rows.forall(_.getString(0).contains("#")))
      assert(rows.forall(_.getLong(4) >= 0L))
      // and the spine's temp view serves them to SQL like any request
      val viaSql = spark.sql(
        "SELECT COUNT(*) FROM observability_requests WHERE path LIKE 'stream:%'")
        .head.getLong(0)
      assert(viaSql >= 2L)
    } finally {
      if (q.isActive) q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("streaming funnel emits one row per stage advance, strictly ordered") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "ts")
    val q = EventStream.funnelStream(events, Seq("view", "click", "purchase"))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    try {
      // batch 1: user 1 views; user 2 clicks BEFORE viewing (no advance)
      input.addData((1L, "view", ts("10:00")), (2L, "click", ts("10:00")))
      q.processAllAvailable()
      // batch 2: user 1 advances through click; user 2 finally views
      input.addData((1L, "click", ts("10:10")), (2L, "view", ts("10:12")))
      q.processAllAvailable()
      // batch 3: user 1 completes; a replayed older click must not advance
      input.addData((1L, "purchase", ts("10:20")), (1L, "click", ts("10:05")))
      q.processAllAvailable()
      val rows = spark.table("funnel_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("funnel_stage")))
      assert(rows.toSet === Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("CDC latest-per-key: cross-batch suppression, ts/event_id winner rule") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val q = EventStream.latestPerKey(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_stream").start()
    try {
      def changes() = spark.table("cdc_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))).toSeq
      // batch 1: two rows for user 1 — applied in ts order, both are
      // advances (the changelog records the intermediate state too)
      input.addData((1L, ts("10:00"), 100L, "view", 1.0),
        (1L, ts("10:30"), 101L, "click", 2.0))
      q.processAllAvailable()
      assert(changes().sorted === Seq((1L, 100L), (1L, 101L)))
      // batch 2: an OLDER row arrives late — suppressed, state unchanged
      input.addData((1L, ts("10:15"), 102L, "view", 3.0))
      q.processAllAvailable()
      assert(changes().sorted === Seq((1L, 100L), (1L, 101L)))
      // batch 3: same ts as the winner, LOWER event_id — suppressed;
      // same ts, HIGHER event_id — wins (the deterministic tie rule)
      input.addData((1L, ts("10:30"), 50L, "view", 4.0))
      q.processAllAvailable()
      assert(changes().sorted === Seq((1L, 100L), (1L, 101L)))
      input.addData((1L, ts("10:30"), 200L, "purchase", 5.0))
      q.processAllAvailable()
      assert(changes().sorted === Seq((1L, 100L), (1L, 101L), (1L, 200L)))
      // a second key tracks independently
      input.addData((2L, ts("09:00"), 300L, "view", 6.0))
      q.processAllAvailable()
      assert(changes().sorted === Seq((1L, 100L), (1L, 101L), (1L, 200L),
        (2L, 300L)))
    } finally q.stop()
  }

  test("CDC state survives a checkpointed restart (no duplicate/missed changes)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-cdc-restart")
    val src = s"$base/src"; val out = s"$base/out"; val cp = s"$base/cp"
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def writeBatch(rows: Seq[(Long, Int, Long)]): Unit =
      rows.map { case (u, min, id) => (u, ts(min), id, "t", 1.0) }
        .toDF("user_id", "ts", "event_id", "event_type", "value")
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = EventStream.latestPerKey(spark.readStream
          .schema("user_id LONG, ts TIMESTAMP, event_id LONG, " +
            "event_type STRING, value DOUBLE").parquet(src))
        .toDF()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch(Seq((1L, 10, 100L), (2L, 10, 200L)))
    runOnce() // run 1 commits the changelog and per-key state to cp
    // the process "dies"; new files arrive: an OLDER row for user 1 (must
    // be suppressed — only possible if state recovered) and a newer row
    // for user 2 (must advance exactly once)
    writeBatch(Seq((1L, 5, 101L), (2L, 20, 201L)))
    runOnce() // restart from the SAME checkpoint
    val got = spark.read.parquet(out)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 100L), (2L, 200L), (2L, 201L)),
      s"restart broke CDC state recovery: $got")
  }

  test("TTL'd streaming funnel evicts idle users; re-entry restarts at stage 0") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "ts")
    val q = EventStream.funnelStream(events, Seq("view", "click", "purchase"),
        idleTtlMinutes = Some(60))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_ttl").start()
    try {
      // user 1 reaches stage 2 by 10:10 -> idle horizon is 11:10
      input.addData((1L, "view", ts("10:00")), (1L, "click", ts("10:10")))
      q.processAllAvailable()
      // unrelated traffic advances the event-time watermark (1h delay) to
      // 12:00 — past user 1's horizon
      input.addData((99L, "noise", ts("13:00")))
      q.processAllAvailable()
      // next batch starts with watermark 12:00 > 11:10: user 1 is evicted
      input.addData((99L, "noise", ts("13:30")))
      q.processAllAvailable()
      // the evicted user re-enters: with retained state a 'view' could not
      // advance past stage 2; after eviction it restarts the funnel
      input.addData((1L, "view", ts("14:00")))
      q.processAllAvailable()
      val rows = spark.table("funnel_ttl").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("funnel_stage")))
      assert(rows.count(_ == (1L, 1L)) === 2,
        s"expected a fresh stage-1 advance after eviction, got ${rows.toSeq}")
      assert(rows.count(_ == (1L, 2L)) === 1)
      assert(!rows.exists(_._1 == 99L)) // noise never advances a stage
    } finally q.stop()
  }

  test("TTL'd latestPerKey: a late ghost event cannot regress an evicted key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val q = EventStream.latestPerKey(events, idleTtlMinutes = Some(30))
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_ttl").start()
    try {
      // user 1's winner is 10:00 -> TTL horizon 10:30
      input.addData((1L, ts("10:00"), 100L, "t", 1.0))
      q.processAllAvailable()
      // unrelated traffic pushes the watermark (1h delay) to 12:00, then
      // the next batch starts past the horizon -> user 1 is evicted
      input.addData((99L, ts("13:00"), 900L, "t", 0.0))
      q.processAllAvailable()
      input.addData((99L, ts("13:30"), 901L, "t", 0.0))
      q.processAllAvailable()
      // GHOST: an out-of-horizon event OLDER than the evicted winner.
      // flatMapGroupsWithState does not drop late rows itself — without
      // the guard this would re-install as a fresh winner and emit a
      // change regressing the downstream upsert to stale data
      input.addData((1L, ts("09:00"), 99L, "t", 2.0))
      q.processAllAvailable()
      // a genuine new event after the watermark re-installs normally
      input.addData((1L, ts("14:00"), 102L, "t", 3.0))
      q.processAllAvailable()
      val got = spark.table("cdc_ttl").filter(col("user_id") === 1L)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(100L, 102L),
        s"ghost event leaked through the TTL path: $got")
    } finally q.stop()
  }

  test("stream-stream interval join matches across micro-batches, in-window only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val vIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val views = vIn.toDF().toDF("v_user", "v_ts", "view_value")
    val purchases = pIn.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStream.intervalJoin(purchases, views,
        "user_id", "v_user", "v_ts", windowMinutes = 60)
      .select(col("event_id"), col("view_value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("interval_join").start()
    try {
      // batch 1: two views for user 1, no purchases yet — both become state
      vIn.addData((1L, ts("10:00"), 1.0), (1L, ts("10:40"), 2.0))
      q.processAllAvailable()
      // batch 2: purchase at 10:50 matches BOTH buffered views (cross-batch
      // state join); purchase at 13:00 has an empty [12:00, 13:00] window
      pIn.addData((100L, 1L, ts("10:50")), (101L, 1L, ts("13:00")))
      q.processAllAvailable()
      val rows = spark.table("interval_join").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("view_value")))
      assert(rows.toSet === Set((100L, 1.0), (100L, 2.0)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("left-outer interval join holds unmatched probes until the watermark clears them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    val vIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventStream.intervalJoin(
        pIn.toDF().toDF("event_id", "user_id", "ts"),
        vIn.toDF().toDF("v_user", "v_ts", "view_value"),
        "user_id", "v_user", "v_ts", windowMinutes = 60,
        joinType = "left_outer")
      .select(col("event_id"), col("view_value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("interval_outer").start()
    try {
      // a purchase with no view: NOT emitted yet — a matching view could
      // still arrive while the watermark lags
      pIn.addData((100L, 1L, ts("10:00")))
      vIn.addData((9L, ts("10:00"), 0.0)) // unrelated user keeps v side live
      q.processAllAvailable()
      assert(spark.table("interval_outer").isEmpty,
        "outer row emitted before the watermark cleared it")
      // both sides advance far past 10:00 + window + delay; the next
      // batch's eviction pass releases the unmatched probe with nulls
      pIn.addData((101L, 2L, ts("14:00"))); vIn.addData((9L, ts("14:00"), 0.0))
      q.processAllAvailable()
      pIn.addData((102L, 2L, ts("15:00"))); vIn.addData((9L, ts("15:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("interval_outer").collect()
        .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[Any]("view_value"))))
      assert(rows.contains((100L, None)),
        s"unmatched purchase never released: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming dedup state survives a checkpointed restart (exactly-once)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-restart")
    val src = s"$base/src"; val out = s"$base/out"; val cp = s"$base/cp"
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def writeBatch(ids: Seq[Long], min: Int): Unit =
      ids.map(i => (i, ts(min))).toDF("id", "ts")
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, ts TIMESTAMP").parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch(Seq(1L, 2L, 3L, 4L, 5L), 0)
    runOnce() // first run commits batch 1 and its dedup state to cp
    // the process "dies"; new files arrive, overlapping the old ones
    writeBatch(Seq(4L, 5L, 6L, 7L, 8L), 1)
    runOnce() // restart from the SAME checkpoint
    val got = spark.read.parquet(out).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // exactly-once across the restart: 4 and 5 are dropped only if the
    // dedup state (and source offsets) really recovered from cp
    assert(got === (1L to 8L),
      s"restart broke exactly-once: $got")
  }

  test("per-window top-k ranks by count with name tie-break and cuts at k") {
    val s = spark
    import s.implicits._
    val agg = Seq(
      (0L, "view", 10L, 1.0), (0L, "click", 10L, 1.0), (0L, "buy", 3L, 1.0),
      (0L, "scroll", 1L, 1.0),
      (3600L, "buy", 5L, 1.0))
      .toDF("window_start", "event_type", "n", "sum_value")
    val top = graft.streaming.EventStream.topKPerWindow(agg, 3)
      .select("window_start", "event_type", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._3))
    // tie at n=10: click before view alphabetically; scroll cut by k=3
    assert(top.toSeq === Seq((0L, "click", 1L), (0L, "view", 2L),
      (0L, "buy", 3L), (3600L, "buy", 1L)))
  }

  test("watermark is attached to the streaming plan") {
    val dir = Files.createTempDirectory("graft-stream3")
    Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val plan = EventStream.hourlyAgg(EventStream.source(spark, dir.toString))
      .queryExecution.logical.toString
    assert(plan.contains("EventTimeWatermark"))
  }

  test("watermark drops late rows only once the advance is committed (staggered vs backlog)") {
    val s = spark
    import s.implicits._
    def run(staggered: Boolean): Set[(Long, Long)] = {
      val dir = Files.createTempDirectory("graft-late").toString
      def onePart(rows: Seq[Long], name: String, mod: Long): Unit = {
        val tmp = new java.io.File(dir, s".s_$name")
        rows.map(sec => new java.sql.Timestamp(sec * 1000)).toDF("ts")
          .repartition(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(dir, name)
        java.nio.file.Files.move(part.toPath, dst.toPath)
        tmp.listFiles().foreach(_.delete()); tmp.delete()
        dst.setLastModified(mod); ()
      }
      val now = System.currentTimeMillis()
      onePart(Seq(100L, 105L), "a.parquet", now - 60000)
      if (!staggered) {
        onePart(Seq(10L, 12L), "b.parquet", now - 30000)
        onePart(Seq(1000L), "c.parquet", now)
      }
      val sink = s"late_${if (staggered) "stag" else "back"}_${System.nanoTime()}"
      val q = spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "10 seconds"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
        .writeStream.outputMode("append").format("memory").queryName(sink)
        .start()
      try {
        q.processAllAvailable()
        if (staggered) {
          onePart(Seq(10L, 12L), "b.parquet", now - 30000)
          q.processAllAvailable()
          onePart(Seq(1000L), "c.parquet", now)
          q.processAllAvailable()
        }
      } finally q.stop()
      val out = spark.table(sink).collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1))).toSet
      spark.catalog.dropTempView(sink)
      out
    }
    // staggered arrival: the on-time batch's committed watermark (95s) is
    // in effect when the late file lands, so [10,20) is dropped and only
    // the on-time window emits (heartbeat's own window never closes)
    assert(run(staggered = true) === Set((100L, 2L)))
    // pre-staged backlog: the late file is processed before the watermark
    // advance takes effect, so the late window SURVIVES — the documented
    // reason e18's fixture staggers arrivals; if Spark ever starts
    // dropping here too, e18's oracle still holds (drop is a superset)
    // but this pin should be updated
    assert(run(staggered = false) === Set((100L, 2L), (10L, 2L)))
  }
}
