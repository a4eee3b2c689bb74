package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch analytic operators in
  * `graft.operators.Sessions` that window functions can't express in
  * Structured Streaming (no lag/RANGE frames over a stream):
  *
  *  - [[rolling]] ↔ `Sessions.rollingCounts` — per-event trailing
  *    time-window count/sum per user;
  *  - [[gaps]] ↔ `Sessions.interEventGaps` — per-user inter-event
  *    gap statistics, updated incrementally.
  *
  * Both are `flatMapGroupsWithState` keyed by user_id (SURVEY §2.5
  * Group B streaming surface) and run identically on a batch Dataset,
  * which is how the specs cross-check them against the batch
  * operators (DuckDB can't oracle late-data semantics, SURVEY §7
  * risk 6).
  *
  * Ordering contract: events are processed in (event-time, event_id)
  * order within each invocation, so results match the batch operator
  * exactly when each user's events arrive across micro-batches in
  * nondecreasing event-time order (and RANGE-frame ties co-arrive).
  * Within-watermark disorder only affects the disordered events' own
  * rows — emitted rows are never retracted.
  */
object StatefulAnalytics {

  import StatefulSessions.{micros, Event}

  // ---------------------------------------------------------------
  // rolling trailing-window counts
  // ---------------------------------------------------------------

  /** Retained per-user tail: events inside the trailing horizon of
    * the newest event seen, as parallel (us, value) arrays. Bounded
    * by the events genuinely inside one window width — the same
    * working set the computation needs — and cleared wholesale by
    * event-time timeout once the watermark passes newest + window. */
  case class RollingState(us: Array[Long], value: Array[Double])

  case class RollingRow(user_id: Long, event_id: Long, us: Long,
                        n_trailing: Long, sum_trailing: Double)

  /** Process a user's new events against the trailing-window tail.
    * For each event: count/sum of the user's events with time in
    * [us − windowUs, us] — RANGE-frame semantics, so equal-time peers
    * (same `us`) see each other regardless of event_id order. */
  def updateRolling(windowUs: Long)(userId: Long, events: Iterator[Event],
                                    state: GroupState[RollingState]): Iterator[RollingRow] = {
    if (state.hasTimedOut) {
      // watermark passed newest event + window: the tail can never
      // intersect a future in-order event's frame
      state.remove()
      return Iterator.empty
    }
    val st = state.getOption.getOrElse(RollingState(Array.empty, Array.empty))
    val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    // merged timeline: retained tail + new events (tail is already
    // sorted; new events sort after in-order arrival). The timeline
    // is time-ascending and events are processed time-ascending, so
    // each frame is a [lo, hi) index span found by two MONOTONE
    // pointers + a prefix-sum — O(events) per batch, not
    // O(events × window) for bursty users.
    val allUs = st.us ++ sorted.map(e => micros(e.ts))
    val allVal = st.value ++ sorted.map(_.value)
    val prefix = new Array[Double](allUs.length + 1)
    var p = 0
    while (p < allUs.length) { prefix(p + 1) = prefix(p) + allVal(p); p += 1 }
    var lo = 0 // first index with us >= frame start
    var hi = 0 // one past the last index with us <= current us
    val out = sorted.map { e =>
      val us = micros(e.ts)
      while (lo < allUs.length && allUs(lo) < us - windowUs) lo += 1
      // peers later in this batch with EQUAL us are in-frame (RANGE
      // includes all peers of the current row); strictly-later
      // events are not
      while (hi < allUs.length && allUs(hi) <= us) hi += 1
      RollingRow(userId, e.event_id, us, (hi - lo).toLong, prefix(hi) - prefix(lo))
    }
    val newest = allUs.last
    val keepFrom = {
      var k = 0
      while (k < allUs.length && allUs(k) < newest - windowUs) k += 1
      k
    }
    state.update(RollingState(allUs.drop(keepFrom), allVal.drop(keepFrom)))
    try state.setTimeoutTimestamp(newest / 1000L + windowUs / 1000L)
    catch { case _: UnsupportedOperationException => () /* batch mode */ }
    out.iterator
  }

  /** Streaming (or batch) trailing-window rolling aggregates. For
    * streaming inputs apply `withWatermark("ts", ...)` first. */
  def rolling(events: Dataset[Event], windowMinutes: Int = 60): Dataset[RollingRow] = {
    val windowUs = windowMinutes.toLong * 60L * 1000000L
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateRolling(windowUs))(Encoders.product[RollingState], Encoders.product[RollingRow])
  }

  // ---------------------------------------------------------------
  // inter-event gap statistics
  // ---------------------------------------------------------------

  /** Per-user running gap aggregate: two longs + three accumulators —
    * bounded by #distinct users, like any per-user counter. */
  case class GapState(lastUs: Long, nEvents: Long, nGaps: Long,
                      maxGapUs: Long, sumGapUs: Long)

  case class GapRow(user_id: Long, n_events: Long, n_gaps: Long,
                    max_gap_us: Option[Long], avg_gap_us: Option[Long])

  /** Fold a user's new events into the running gap aggregate and
    * emit the updated row (update-stream semantics: one fresh row per
    * user per batch that saw data; the latest row per user is the
    * current answer). A single-event user has no gaps — max/avg stay
    * null, n_gaps disambiguates, matching the batch operator. */
  def updateGaps(userId: Long, events: Iterator[Event],
                 state: GroupState[GapState]): Iterator[GapRow] = {
    val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(GapState(Long.MinValue, 0L, 0L, 0L, 0L))
    sorted.foreach { e =>
      val us = micros(e.ts)
      if (st.nEvents > 0L) {
        val gap = us - st.lastUs
        st = GapState(us, st.nEvents + 1, st.nGaps + 1,
          math.max(st.maxGapUs, gap), st.sumGapUs + gap)
      } else st = GapState(us, 1L, 0L, 0L, 0L)
    }
    state.update(st)
    Iterator.single(GapRow(userId, st.nEvents, st.nGaps,
      if (st.nGaps > 0) Some(st.maxGapUs) else None,
      if (st.nGaps > 0) Some(Math.floorDiv(st.sumGapUs, st.nGaps)) else None))
  }

  /** Streaming (or batch) inter-event gap statistics. State never
    * times out — it is the aggregate itself (two longs + three
    * accumulators per user), exactly the state any running per-user
    * aggregate carries. */
  def gaps(events: Dataset[Event]): Dataset[GapRow] =
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateGaps)(Encoders.product[GapState], Encoders.product[GapRow])

  // ---------------------------------------------------------------
  // forward-fill imputation
  // ---------------------------------------------------------------

  /** Per-user carry: the most recent valid reading (and its time, for
    * the in-order contract). One double + one long + one flag per
    * user — the minimal state forward-fill fundamentally needs. */
  case class FillState(lastUs: Long, lastValid: Double, hasValid: Boolean)

  case class FillRow(user_id: Long, event_id: Long, us: Long,
                     filled_value: Option[Double], was_filled: Boolean)

  /** Repair a user's new events against the carried last-valid value
    * (↔ `Sessions.fillForward`): rows matching `isMissing` emit the
    * carry (null while no valid reading has ever arrived), valid rows
    * refresh it. Append-mode — emitted rows are final, exactly like
    * the batch window's running `last(_, ignoreNulls)` frame. */
  def updateFill(isMissing: Event => Boolean)(
      userId: Long, events: Iterator[Event],
      state: GroupState[FillState]): Iterator[FillRow] = {
    val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(FillState(Long.MinValue, 0.0, false))
    val out = sorted.map { e =>
      val us = micros(e.ts)
      if (isMissing(e))
        FillRow(userId, e.event_id, us,
          if (st.hasValid) Some(st.lastValid) else None, was_filled = true)
      else {
        st = FillState(us, e.value, hasValid = true)
        FillRow(userId, e.event_id, us, Some(e.value), was_filled = false)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Streaming (or batch) forward-fill imputation. State never times
    * out — the carry must survive arbitrarily long silences (a user's
    * next glitch may come days after their last valid reading). */
  def fillForward(events: Dataset[Event],
                  isMissing: Event => Boolean): Dataset[FillRow] =
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateFill(isMissing))(Encoders.product[FillState], Encoders.product[FillRow])

  // ---------------------------------------------------------------
  // latest-state compaction (↔ Sessions.latestState)
  // ---------------------------------------------------------------

  /** Per-user running champion + counters: the (us, event_id)-max
    * event's fields, the event count, and the lifetime sum held in
    * exact CENTS (the streaming image of the batch operator's
    * DECIMAL(18,2) accumulation — long addition is associative, so
    * the sum is arrival-order-stable where double addition is not). */
  case class LatestState(us: Long, eventId: Long, eventType: String,
                         value: Double, nEvents: Long, lifetimeCents: Long)

  case class LatestRow(user_id: Long, last_us: Long, last_event_id: Long,
                       last_event_type: String, last_value: Double,
                       n_events: Long, lifetime_value: Double)

  /** Exact-cents conversion mirroring the batch `CAST(value AS
    * DECIMAL(18,2))` including its failure mode: the batch cast turns
    * NaN/Infinity and values beyond DECIMAL(18,2)'s range into NULL,
    * which `sum` then skips — so here those values contribute 0 to
    * the running sum instead of throwing (`BigDecimal.valueOf(NaN)`
    * raises NumberFormatException, `longValueExact` overflows past
    * ~9.2e16) and crashing the streaming query the batch twin
    * survives. */
  private def cents(v: Double): Long =
    if (java.lang.Double.isFinite(v) && math.abs(v) < 1e16)
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact()
    else 0L

  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Fold new events into the champion/counters and emit the updated
    * row (update-stream semantics, like [[updateGaps]]: the latest
    * row per user is the current compacted state). The (us, event_id)
    * comparison makes the champion arrival-order-independent, so
    * late-but-in-watermark events fold in correctly. */
  def updateLatest(userId: Long, events: Iterator[Event],
                   state: GroupState[LatestState]): Iterator[LatestRow] = {
    val evs = events.toArray
    if (evs.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(
      LatestState(Long.MinValue, Long.MinValue, "", 0.0, 0L, 0L))
    evs.foreach { e =>
      val us = micros(e.ts)
      val newer = us > st.us || (us == st.us && e.event_id > st.eventId)
      st = LatestState(
        if (newer) us else st.us,
        if (newer) e.event_id else st.eventId,
        if (newer) e.event_type else st.eventType,
        if (newer) e.value else st.value,
        st.nEvents + 1L,
        st.lifetimeCents + cents(e.value))
    }
    state.update(st)
    Iterator.single(LatestRow(userId, st.us, st.eventId, st.eventType,
      round6(st.value), st.nEvents, st.lifetimeCents / 100.0))
  }

  /** Streaming (or batch) latest-state compaction. State never times
    * out — it IS the compacted row (one champion struct + two longs
    * per user), the same footprint any keyed upsert view carries. */
  def latest(events: Dataset[Event]): Dataset[LatestRow] =
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateLatest)(Encoders.product[LatestState], Encoders.product[LatestRow])
}
