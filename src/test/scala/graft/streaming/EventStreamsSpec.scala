package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Streaming operators driven through actual incremental execution
  * (MemoryStream → micro-batches → memory sink), not just batch-mode
  * equivalence. */
class EventStreamsSpec extends SparkSpecBase {

  private def eventDf(rows: Seq[(Long, String, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts_str", "user_id", "event_type", "value")
      .select(
        col("event_id"),
        to_timestamp(col("ts_str")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  test("windowedCounts: tumbling windows aggregate by event type (batch parity)") {
    val df = eventDf(Seq(
      (1L, "2024-01-01 00:05:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:25:00", 2L, "click", 2.0),
      (3L, "2024-01-01 01:10:00", 1L, "error", 3.0)))
    val out = EventStreams.windowedCounts(df).orderBy("window_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("event_type") == "click")
    assert(out(0).getAs[Long]("n") == 2L)
    assert(out(1).getAs[String]("event_type") == "error")
  }

  test("windowedCounts runs incrementally with watermark state (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, String, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts_str", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_str")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
    val query = EventStreams.windowedCounts(streamDf)
      .writeStream.format("memory").queryName("wc_test").outputMode("append").start()
    try {
      mem.addData((1L, "2024-01-01 00:05:00", 1L, "click", 1.0))
      mem.addData((2L, "2024-01-01 00:25:00", 2L, "click", 2.0))
      query.processAllAvailable()
      // append mode: window not emitted until watermark passes its end —
      // push the watermark beyond 01:00 + 10min
      mem.addData((3L, "2024-01-01 02:00:00", 1L, "error", 3.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM wc_test").collect()
      assert(rows.length == 1) // the closed 00:00-01:00 click window
      assert(rows(0).getAs[Long]("n") == 2L)
      assert(rows(0).getAs[String]("event_type") == "click")
    } finally query.stop()
  }

  test("slidingRates: each event lands in every overlapping 1h/5m window") {
    val df = eventDf(Seq(
      (1L, "2024-01-01 01:02:00", 1L, "click", 1.0),
      (2L, "2024-01-01 01:03:00", 2L, "click", 1.0)))
    val out = EventStreams.slidingRates(df).orderBy("window_start").collect()
    // a 1-hour window sliding every 5 minutes covers each instant 12x
    assert(out.length == 12)
    assert(out.forall(_.getAs[Long]("n") == 2L))
    // windows slide on 5-minute boundaries around the events
    val starts = out.map(_.getTimestamp(0).toString)
    assert(starts.head == "2024-01-01 00:05:00.0" && starts.last == "2024-01-01 01:00:00.0")
  }

  test("sessionCounts: session_window groups by gap") {
    val df = eventDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:10:00", 1L, "click", 1.0),  // same session (10 min gap)
      (3L, "2024-01-01 02:00:00", 1L, "click", 1.0),  // new session
      (4L, "2024-01-01 00:00:00", 2L, "click", 1.0)))
    val out = EventStreams.sessionCounts(df).orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L)
  }

  test("statefulSessions: flatMapGroupsWithState emits gap-separated sessions") {
    import spark.implicits._
    val events = Seq(
      (1L, 1000L), (1L, 2000L), (1L, 100000L), // user 1: 2 sessions (gap 10s)
      (2L, 5000L)).toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
    val out = EventStreams.statefulSessions(events, gapMs = 10000L)
      .collect().sortBy(s => (s.userId, s.startMs))
    assert(out.length == 3)
    assert(out(0) == EventStreams.SessionOut(1L, 1000L, 2000L, 2))
    assert(out(1) == EventStreams.SessionOut(1L, 100000L, 100000L, 1))
    assert(out(2) == EventStreams.SessionOut(2L, 5000L, 5000L, 1))
  }

  test("statefulSessions streaming: emission is watermark-gated, exactly once per session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user_id, epoch seconds)
    val ds = mem.toDF().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
      .withWatermark("ts", "0 seconds")
    val query = EventStreams.statefulSessions(ds, gapMs = 10000L)
      .writeStream.format("memory").queryName("ss_stream").outputMode("append").start()
    try {
      def emitted() = spark.sql("SELECT * FROM ss_stream").as[EventStreams.SessionOut]
        .collect().toSeq
      mem.addData((1L, 1L), (1L, 2L))
      query.processAllAvailable()
      // session still open: nothing emitted (the old NoTimeout version
      // re-emitted the growing open session every micro-batch)
      assert(emitted().isEmpty)
      mem.addData((1L, 100L))
      query.processAllAvailable()
      // 100s exceeds the gap, but emission is WATERMARK-gated, not
      // gap-break-gated: a bridging event at e.g. 7s could still arrive
      // (watermark was 2s while this batch ran), so [1s,2s] is retained
      // until the watermark passes 2s+gap
      mem.addData((2L, 300L)) // watermark during next batch: 100s
      query.processAllAvailable()
      assert(emitted().contains(EventStreams.SessionOut(1L, 1000L, 2000L, 2)),
        s"12s < wm 100s: the 1-2s session must have emitted; got ${emitted()}")
      mem.addData((2L, 500L)) // wm 300s -> user 1's [100s] session safe
      query.processAllAvailable()
      mem.addData((2L, 700L)) // wm 500s -> user 2's [300s] session safe
      query.processAllAvailable()
      val must = Set(
        EventStreams.SessionOut(1L, 1000L, 2000L, 2),
        EventStreams.SessionOut(1L, 100000L, 100000L, 1),
        EventStreams.SessionOut(2L, 300000L, 300000L, 1))
      // [500s] may emit if a timeout-only batch ran after wm reached
      // 700s; [700s] can never have (its safety needs wm > 710s)
      val may = must + EventStreams.SessionOut(2L, 500000L, 500000L, 1)
      val got = emitted()
      assert(got.toSet.subsetOf(may) && must.subsetOf(got.toSet), got.toString)
      assert(got.size == got.toSet.size, s"duplicate emission: $got")
    } finally query.stop()
  }

  test("statefulSessions streaming: out-of-order events can't regress or corrupt sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 60s watermark delay: rows up to 60s behind the max seen event time
    // still reach the operator — out of order w.r.t. the restored state.
    val mem = MemoryStream[(Long, Long)] // (user_id, epoch seconds)
    val ds = mem.toDF().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
      .withWatermark("ts", "60 seconds")
    val query = EventStreams.statefulSessions(ds, gapMs = 10000L)
      .writeStream.format("memory").queryName("ss_late").outputMode("append").start()
    try {
      def emitted() = spark.sql("SELECT * FROM ss_late").as[EventStreams.SessionOut]
        .collect().sortBy(s => (s.userId, s.startMs)).toSeq
      mem.addData((1L, 100L))
      query.processAllAvailable() // watermark 40s; session open at [100s, 100s]
      // Out-of-order events more than a gap before the open session's
      // start (both < 100s - 10s): sessionize among themselves as ONE
      // session (45s and 50s are within a gap of each other; per-event
      // singletons would split it). They stay in state — not emitted —
      // until the watermark passes 50s+gap: a bridging event could
      // still arrive. Pre-fix the merge branch swallowed them AND
      // regressed the open session's end.
      mem.addData((1L, 50L), (1L, 45L))
      query.processAllAvailable()
      // Out-of-order event within the gap of the open session: merges,
      // extending the session START backwards without touching its end.
      mem.addData((1L, 95L))
      query.processAllAvailable()
      mem.addData((1L, 300L)) // wm during batch still 40s
      query.processAllAvailable()
      mem.addData((1L, 400L)) // wm 240s: both retained sessions now safe
      query.processAllAvailable()
      assert(emitted().contains(EventStreams.SessionOut(1L, 45000L, 50000L, 2)),
        s"beyond-gap out-of-order events sessionize among themselves: ${emitted()}")
      // bounds [95s, 100s]: an end of 95s would mean the merge
      // regressed it (pre-fix `last = t` produced end < start here)
      assert(emitted().contains(EventStreams.SessionOut(1L, 95000L, 100000L, 2)),
        s"merged session must keep its 100s end, got ${emitted()}")
    } finally query.stop()
  }

  test("statefulSessions: a later in-gap merge pulls an earlier 'stale' event back into range") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val ds = mem.toDF().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
      .withWatermark("ts", "60 seconds")
    val query = EventStreams.statefulSessions(ds, gapMs = 10000L)
      .writeStream.format("memory").queryName("ss_pull").outputMode("append").start()
    try {
      mem.addData((1L, 100L))
      query.processAllAvailable() // state [100s,100s], watermark 40s
      // one batch delivers 85s then 95s: 85s is beyond-gap vs start=100s,
      // but 95s merges and extends start to 95s — which brings 85s
      // (>= 95s - 10s) into range. Correct result: ONE session, not a
      // stale singleton plus a merged pair.
      mem.addData((1L, 85L), (1L, 95L))
      query.processAllAvailable()
      mem.addData((1L, 300L))
      query.processAllAvailable()
      mem.addData((1L, 400L)) // wm 240s: the [85s,100s] session is safe
      query.processAllAvailable()
      val out = spark.sql("SELECT * FROM ss_pull").as[EventStreams.SessionOut]
        .collect().toSeq
      assert(out.contains(EventStreams.SessionOut(1L, 85000L, 100000L, 3)), out.toString)
      assert(!out.exists(s => s.nEvents == 1 && s.startMs == 85000L),
        s"85s must not emit as a stale singleton: $out")
    } finally query.stop()
  }

  test("statefulSessions: a stale event merges into a session that closes in the SAME batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val ds = mem.toDF().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
      .withWatermark("ts", "60 seconds")
    val query = EventStreams.statefulSessions(ds, gapMs = 10000L)
      .writeStream.format("memory").queryName("ss_close").outputMode("append").start()
    try {
      mem.addData((1L, 100L))
      query.processAllAvailable() // state [100s,100s], watermark 40s
      // one batch delivers 85s, 95s AND the gap-separated 200s: the
      // restored session merges to [85s,100s]; 85s must land in that
      // session — the old re-merge only reconsidered stale events
      // against the newest session ([200s,200s] here), so 85s split
      // off as a singleton.
      mem.addData((1L, 85L), (1L, 95L), (1L, 200L))
      query.processAllAvailable()
      mem.addData((1L, 400L)) // wm 140s: [85s,100s] safe (110s < 140s)
      query.processAllAvailable()
      val out = spark.sql("SELECT * FROM ss_close").as[EventStreams.SessionOut]
        .collect().toSeq
      assert(out.contains(EventStreams.SessionOut(1L, 85000L, 100000L, 3)), out.toString)
      assert(!out.exists(s => s.nEvents == 1 && s.startMs == 85000L), out.toString)
    } finally query.stop()
  }

  test("statefulSessions differential property: streaming == batch == lag/running-sum " +
      "reference under random events, random micro-batch splits, random arrival order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Independent reference implementation: the q42 batch algorithm
    // (sort per user, split where the gap exceeds, min/max/count) —
    // a different formulation than the interval-merge in the operator.
    def referenceSessions(
        events: Seq[(Long, Long)], gapMs: Long): Set[EventStreams.SessionOut] =
      events.groupBy(_._1).flatMap { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        val out = scala.collection.mutable.ArrayBuffer[EventStreams.SessionOut]()
        var start = ts.head; var last = ts.head; var n = 1L
        ts.tail.foreach { t =>
          if (t - last > gapMs) {
            out += EventStreams.SessionOut(u, start, last, n)
            start = t; n = 0
          }
          last = t; n += 1
        }
        out += EventStreams.SessionOut(u, start, last, n)
        out
      }.toSet

    val rnd = new scala.util.Random(20260812L) // fixed seed: reproducible trials
    val SentinelMs = 5000L * 1000
    for (trial <- 1 to 12) {
      val gapMs = Seq(5000L, 10000L, 30000L)(rnd.nextInt(3))
      val users = 1 + rnd.nextInt(3)
      val n = 5 + rnd.nextInt(35)
      // duplicates allowed (same user+ms twice): both must be counted.
      // Times start at 1s: an epoch-0 event ties the INITIAL watermark
      // and Spark's stateful late-row filter drops eventTime <= wm —
      // a harness artifact, not sessionizer behavior under test.
      val events = Seq.fill(n)(
        (1L + rnd.nextInt(users).toLong, (1 + rnd.nextInt(300)) * 1000L))
      val expected = referenceSessions(events, gapMs)

      // batch mode of the operator itself
      val batchDf = events.toDF("user_id", "ms")
        .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
      val batchOut = EventStreams.statefulSessions(batchDf, gapMs).collect().toSet
      assert(batchOut == expected,
        s"trial $trial (gap $gapMs): batch operator diverged\n events=$events")

      // streaming mode: shuffled arrival order, random micro-batch split,
      // then a sentinel event per user that gap-closes every open session.
      // Watermark delay exceeds the event span so no row is ever dropped —
      // the operator must sessionize fully out-of-order input correctly.
      val shuffled = rnd.shuffle(events)
      val nBatches = 1 + rnd.nextInt(5)
      val batches = shuffled.grouped(math.max(1, (shuffled.size + nBatches - 1) / nBatches))
        .toSeq
      val mem = MemoryStream[(Long, Long)]
      val ds = mem.toDF().toDF("user_id", "ms")
        .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
        .withWatermark("ts", "1000 seconds")
      val sink = s"ss_prop_$trial"
      val query = EventStreams.statefulSessions(ds, gapMs)
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
        // two sentinel rounds: the first advances the watermark past
        // every real session's last+gap, the second delivers a data
        // batch that runs WITH that watermark so the now-safe sessions
        // emit (no reliance on timeout-only empty batches)
        Seq(SentinelMs, SentinelMs + 2000 * 1000).foreach { sm =>
          mem.addData((1L to users).map(u => (u, sm)): _*)
          query.processAllAvailable()
        }
        val streamOut = spark.sql(s"SELECT * FROM $sink")
          .as[EventStreams.SessionOut].collect().toSet
          .filterNot(_.startMs >= SentinelMs) // the sentinels' own sessions
        assert(streamOut == expected,
          s"trial $trial (gap $gapMs, ${batches.size} batches): streaming diverged\n" +
            s" events=$events\n batches=$batches\n got=$streamOut\n want=$expected")
      } finally query.stop()
    }
  }

  test("dedupWithinWatermark: duplicates inside the horizon drop, state expires past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (content_hash, epoch seconds)
    val ds = mem.toDF().toDF("content_hash", "sec")
      .select(col("content_hash"), timestamp_seconds(col("sec")).as("ts"))
    val query = EventStreams.dedupWithinWatermark(ds, Seq("content_hash"), "30 seconds")
      .writeStream.format("memory").queryName("dd_stream").outputMode("append").start()
    try {
      def n() = spark.sql("SELECT count(*) FROM dd_stream").collect()(0).getLong(0)
      mem.addData((7L, 100L), (7L, 110L), (8L, 105L))
      query.processAllAvailable()
      assert(n() == 2, "duplicate key within the horizon must be dropped")
      // push the watermark far past 110s + 30s so key 7's state expires
      mem.addData((9L, 1000L))
      query.processAllAvailable()
      mem.addData((7L, 1010L)) // same key, new epoch: state expired → emits
      query.processAllAvailable()
      assert(n() == 4, "a key recurring after the horizon is new again")
    } finally query.stop()
  }

  test("dedupWithinWatermark differential property: within-horizon streaming == batch distinct " +
      "under random arrival order and micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(0xdedb)
    for (trial <- 1 to 6) {
      // small key pool forces collisions; event span (≤200s) stays far
      // inside the 1000s horizon, where streaming dedup must agree with
      // batch distinct exactly — each key emitted exactly once
      val n = 10 + rnd.nextInt(40)
      val events = Seq.fill(n)(
        (rnd.nextInt(12).toLong, (1 + rnd.nextInt(200)) * 1000L))
      val distinctKeys = events.map(_._1).toSet

      val shuffled = rnd.shuffle(events)
      val nBatches = 1 + rnd.nextInt(4)
      val batches = shuffled.grouped(
        math.max(1, (shuffled.size + nBatches - 1) / nBatches)).toSeq
      val mem = MemoryStream[(Long, Long)]
      val ds = mem.toDF().toDF("content_hash", "ms")
        .select(col("content_hash"), timestamp_millis(col("ms")).as("ts"))
      val sink = s"dd_prop_$trial"
      val query = EventStreams.dedupWithinWatermark(ds, Seq("content_hash"), "1000 seconds")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
        val out = spark.sql(s"SELECT content_hash FROM $sink").as[Long].collect().toSeq
        assert(out.toSet == distinctKeys,
          s"trial $trial: key sets diverged\n events=$events\n batches=$batches")
        assert(out.size == distinctKeys.size,
          s"trial $trial: duplicate emission — ${out.size} rows for ${distinctKeys.size} keys")
      } finally query.stop()
    }
  }

  test("flushToParquet: foreachBatch lands micro-batches durably (promoter analog)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("graft-flush").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[Long]
    val query = EventStreams.flushToParquet(mem.toDF(), outDir, ckpt)
    try {
      mem.addData(1L, 2L, 3L)
      query.processAllAvailable()
      mem.addData(4L)
      query.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 4)
    } finally query.stop()
  }
}
