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
    * A session is emitted exactly once, when it is WATERMARK-SAFE:
    * `last + gap < watermark`, i.e. no event the stream can still
    * deliver could extend or bridge it. That is a strictly stronger
    * condition than "a later event exceeded the gap": with out-of-order
    * delivery (any nonzero watermark delay), a gap-separated pair of
    * sessions can be BRIDGED by an event that arrives later but falls
    * between them — so gap-break emission would split what is really
    * one session. (A differential property test against the batch
    * formulation caught exactly that: event A arrives alone, looks
    * gap-isolated, is emitted; then B arrives bridging A to C.) The
    * state therefore holds ALL not-yet-safe sessions of the key — a
    * sorted, gap-separated interval list, merged with each batch's
    * events in one interval-merge pass — and each invocation (data or
    * event-time timeout) emits the prefix that became safe. State stays
    * bounded by the watermark horizon: a session retained past its gap
    * is emitted as soon as the watermark crosses it, and the horizon
    * bounds how many distinct unsafe sessions can coexist per key.
    *
    * Streaming callers must define a watermark upstream of the
    * projection (EventTimeTimeout requires one). In batch execution all
    * rows of a key arrive in the single invocation and nothing can
    * arrive later, so every merged session is emitted directly
    * (timeouts never fire in batch).
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
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout) {
        (userId: Long, rawRows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[List[SessionState]]) =>
          // One pass handles every invocation shape — data batch, timeout
          // firing (empty rows), or both: merge state intervals + event
          // points sorted by start, then split safe/unsafe on the current
          // watermark. Sorting by start makes the gap check against the
          // running interval's `last` the full merge condition; max() so
          // a contained item can't regress the end.
          val incoming = rawRows.map(r => { val t = r._2.getTime; SessionState(t, t, 1) }).toSeq
          val items = (state.getOption.getOrElse(Nil) ++ incoming).sortBy(s => (s.start, s.last))
          val merged = scala.collection.mutable.ArrayBuffer[SessionState]()
          items.foreach { s =>
            merged.lastOption match {
              case Some(c) if s.start - c.last <= gapMs =>
                merged(merged.length - 1) =
                  SessionState(c.start, math.max(c.last, s.last), c.n + s.n)
              case _ => merged += s
            }
          }
          if (!streaming) {
            // batch: the single invocation saw everything — all final
            state.remove()
            merged.iterator.map(s => SessionOut(userId, s.start, s.last, s.n))
          } else {
            val wm = state.getCurrentWatermarkMs()
            val (safe, open) = merged.partition(s => s.last + gapMs < wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(open.toList)
              // wake when the earliest retained session crosses the
              // watermark. Clamped one past the current watermark:
              // setTimeoutTimestamp at/below it throws and would kill
              // the whole query (reachable when a safe-boundary session
              // is retained because wm advanced mid-batch).
              state.setTimeoutTimestamp(
                math.max(open.map(s => s.last + gapMs).min + 1, wm + 1))
            }
            safe.iterator.map(s => SessionOut(userId, s.start, s.last, s.n))
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
