package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-stream aggregation (SURVEY.md §2.9) — the Spark-native extension
 * of the engine to event telemetry: tumbling-window aggregates and
 * gap-based sessionization. Each operator has ONE logical definition that
 * runs both batch (DuckDB-oracle-checkable) and streaming:
 *  - windowedCounts: `window()` grouping works unchanged on a streaming
 *    frame once `withWatermark` is applied by the caller;
 *  - sessionize (batch): lag/cumsum windows — the oracle twin;
 *  - sessionizeStream: flatMapGroupsWithState with event-time timeout —
 *    the same session semantics under continuous arrival (§2.10 custom
 *    state op). SessionizeSpec asserts stream == batch on one fixture.
 */
object EventAgg extends Serializable {

  /** Tumbling-window per-type aggregate. Epoch-aligned windows — matches
    * DuckDB's time_bucket. Works on batch and (watermarked) streaming
    * input unchanged. */
  def windowedCounts(events: DataFrame, windowDuration: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDuration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /**
   * Batch gap sessionization: a new session starts when the gap from the
   * previous event of the same user exceeds `gapMinutes`. Microsecond
   * arithmetic (unix_micros) — second truncation would disagree with the
   * DuckDB oracle's epoch_us on sub-second gaps. Deterministic under ts
   * ties via the event_id tiebreak.
   */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    // cast: parquet event times arrive as TIMESTAMP_NTZ; under the UTC
    // session the cast is value-preserving and unix_micros == DuckDB's
    // epoch_us on the same column
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val flagged = events.withColumn("prev_us", lag(tsUs, 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || tsUs - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_num", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("sess_num"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  /** Open-session state: timestamps in epoch micros. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /**
   * Streaming sessionization: same gap semantics as [[sessionize]], kept
   * per-user in GroupState; sessions close either when a later event
   * arrives past the gap or when the event-time watermark passes the
   * session's gap horizon (EventTimeTimeout). Callers must apply
   * `withWatermark("ts", ...)` on the input.
   */
  private def finishSession(userId: Long, st: SessionState): SessionOut =
    SessionOut(userId, fromMicros(st.startUs), fromMicros(st.lastUs), st.n, st.sum)

  /** Per-group state transition (top-level method: the closure passed to
    * flatMapGroupsWithState must not capture the driver-side Dataset). */
  private def sessionStep(gapUs: Long)(userId: Long, rows: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (rows.isEmpty && state.hasTimedOut) {
      // watermark passed the gap horizon: the open session is final
      val out = state.getOption.map(finishSession(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var cur = state.getOption
    sorted.foreach { e =>
      val us = micros(e.ts)
      cur match {
        case Some(st) if us - st.lastUs <= gapUs =>
          cur = Some(SessionState(st.startUs, math.max(st.lastUs, us),
            st.n + 1, st.sum + e.value))
        case Some(st) =>
          closed += finishSession(userId, st)
          cur = Some(SessionState(us, us, 1L, e.value))
        case None =>
          cur = Some(SessionState(us, us, 1L, e.value))
      }
    }
    cur.foreach { st =>
      state.update(st)
      // clamp to just past the current watermark: an event already older
      // than watermark-by-more-than-gap puts the session horizon AT/BEFORE
      // the watermark, and setTimeoutTimestamp throws for non-increasing
      // timeouts — which would kill the whole streaming query on one late
      // row. Clamped, the stale session times out on the next trigger.
      val horizonMs = (st.lastUs + gapUs) / 1000L + 1L
      state.setTimeoutTimestamp(math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
    }
    closed.iterator
  }

  def sessionizeStream(events: Dataset[Event], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionStep(gapUs) _)
  }
}
