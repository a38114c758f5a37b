package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the events stream.
  *
  * The reference has no streaming engine — its closest analogs are the
  * client's dirty-segment promoter thread (trough/client.py:71-97) and
  * the periodic sync loops (scripts/sync.py:33-43), both periodic batch.
  * These operators are the north-star extensions (SURVEY §2.B
  * "Streaming"), built on Structured Streaming so the same DataFrame
  * code runs incrementally with state, watermarks, and exactly-once
  * sinks at cluster scale.
  *
  * All transformations take a DataFrame with the `events` schema
  * (event_id, ts timestamp, user_id, event_type, value, props) and work
  * identically for batch DataFrames and streaming DataFrames — the
  * standard Structured Streaming contract, which also makes them
  * testable against MemoryStream and the static corpus.
  */
object EventStreams {

  /** Tumbling-window event counts/sums per event type with a watermark:
    * classic streaming aggregation; state is bounded by the watermark
    * horizon (late rows beyond 10 minutes are dropped). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding-window rates (5-minute slide over 1-hour windows). */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows keyed by user: built-in session_window with a
    * 30-minute gap — the declarative form. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * escape hatch for session logic session_window can't express (e.g.
    * emitting only on session *close*, enriching with per-session
    * aggregates).
    *
    * A session is emitted exactly once, when it CLOSES: either a later
    * event for the same user exceeds the gap, or (streaming) the
    * event-time timeout fires once the watermark passes last+gap. Open
    * sessions live only in state — no per-micro-batch re-emission of a
    * growing open session, and state expires with the watermark.
    * Streaming callers must define a watermark upstream of the
    * projection (EventTimeTimeout requires one). In batch execution all
    * rows of a key arrive in the single invocation, so the trailing
    * session is final by construction and is emitted directly (timeouts
    * never fire in batch).
    *
    * Takes (user_id, ts) with ts a real TimestampType column — the
    * watermark marker rides on that attribute, so projecting it to a
    * long before this operator would strip it and fail analysis. */
  def statefulSessions(
      events: DataFrame, // columns: user_id long, ts timestamp (watermarked if streaming)
      gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    events
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      // no typed .map to millis here: SerializeFromObject would mint new
      // attributes without the watermark metadata the timeout check needs
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout) {
        (userId: Long, rawRows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          val rows = rawRows.map(r => (r._1, r._2.getTime))
          if (streaming && state.hasTimedOut) {
            // watermark passed last+gap with no newer event: session closed
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.last, s.n))
          } else {
            // Sessionize the restored open session (an interval item)
            // and this batch's events (point items) in ONE sorted
            // interval-merge pass. Spark drops rows strictly below the
            // watermark before this operator, but the watermark lags the
            // state by a batch (it is computed from the PREVIOUS batch's
            // max event time), so rows still arrive out of order w.r.t.
            // the restored state — in-gap behind it, or even more than a
            // gap before its start. Sorting state+events together by
            // start handles every such ordering uniformly: a late event
            // merges into whichever session it gap-touches — including
            // one that CLOSES later in this same pass — or forms its
            // own. (The previous two-phase stale-event re-merge only
            // reconsidered late events against the still-open session,
            // so a late event whose session closed within the same batch
            // was wrongly emitted as a singleton, splitting the session.)
            val items = (state.getOption.toSeq ++ rows.map { case (_, t) => SessionState(t, t, 1) })
              .sortBy(s => (s.start, s.last))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur: Option[SessionState] = None
            items.foreach { s =>
              cur match {
                // sorted by start, so s.start >= c.start and the gap
                // check against c.last is the full merge condition (an
                // item inside the current interval has s.start - c.last
                // <= 0); max() so a contained item can't REGRESS the end
                case Some(c) if s.start - c.last <= gapMs =>
                  cur = Some(SessionState(c.start, math.max(c.last, s.last), c.n + s.n))
                case Some(c) =>
                  out += SessionOut(userId, c.start, c.last, c.n)
                  cur = Some(s)
                case None => cur = Some(s)
              }
            }
            cur match {
              case Some(s) if streaming =>
                state.update(s)
                // clamp: if last+gap lands at/below the current
                // watermark, setTimeoutTimestamp throws and kills the
                // whole streaming query. Spark's pre-operator late-row
                // filter makes that unreachable today (rows >= watermark
                // keep last+gap above it), but that filter is Spark's
                // internal behavior, not a contract this operator should
                // lean its availability on — schedule one ms past the
                // watermark and the session closes on the next trigger
                state.setTimeoutTimestamp(
                  math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
              case Some(s) => // batch: all data seen — trailing session is final
                out += SessionOut(userId, s.start, s.last, s.n)
                state.remove()
              case None => state.remove()
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup — the incremental analog of
    * [[graft.pipeline.Dedup.exact]]: drop rows whose dedup key was
    * already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark`). State is bounded by the horizon
    * × key cardinality, NOT stream length — the property that makes
    * continuous dedup viable on an unbounded 100 TB/day ingest stream;
    * a key recurring after the horizon passes is treated as new (the
    * batch `Dedup.exact` over the landed corpus is the exhaustive
    * backstop, same pairing as q29→q30). Works identically for batch
    * DataFrames (exact distinct-by-key). */
  def dedupWithinWatermark(
      events: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(keyCols.nonEmpty, "dedup needs at least one key column")
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)
  }

  /** The promotion-flush analog (reference dirty-segment promoter,
    * client.py:71-97): stream micro-batches landed durably via
    * foreachBatch. Idempotent per batch id — each micro-batch writes
    * (mode=overwrite) its own `batch_id=<id>` subdirectory, so a batch
    * replayed after a failure (checkpoint not yet committed) replaces
    * its previous partial output instead of appending duplicates:
    * effectively-once, not just at-least-once. Readers of `outDir` see
    * `batch_id` as a normal hive partition column. */
  def flushToParquet(events: DataFrame, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .start()
}
