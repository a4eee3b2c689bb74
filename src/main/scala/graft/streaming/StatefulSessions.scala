package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-sessionization with `flatMapGroupsWithState` — the
  * Structured Streaming counterpart of the batch
  * `Sessions.sessionize` (lag + running sum). Custom per-user state
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`, SURVEY §2.5
  * Group B streaming surface): events accumulate into an open
  * session; a gap > `gapMinutes` closes and emits it; an event-time
  * timeout (watermark passing last-event + gap) closes the final
  * session. Works identically on a batch Dataset (single pass per
  * group), which is how the spec cross-checks it against the batch
  * operator.
  *
  * State = [[UserState]]: the next session id to assign plus the
  * (optional) open session. The sid counter survives session close —
  * a post-timeout event for the same user continues the monotone
  * per-user sid sequence, matching the batch operator's running-sum
  * numbering. Residual per-user state after close is two longs
  * (bounded by #distinct users, like any per-user counter).
  */
object StatefulSessions {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  case class OpenSession(sid: Long, startUs: Long, lastUs: Long,
                         nEvents: Long, sumValue: Double)

  case class UserState(nextSid: Long, open: Option[OpenSession])

  case class ClosedSession(user_id: Long, sid: Long, n_events: Long,
                           dur_us: Long, sum_value: Double)

  /** Full-microsecond event time. `Timestamp.getTime` truncates to
    * milliseconds; the sub-millisecond part lives in `getNanos`, so
    * gap decisions must be rebuilt from seconds + nanos to agree with
    * the batch operator's `unix_micros` (events.ts is micros). */
  private[streaming] def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Process a user's new events against open-session state. */
  def updateUser(gapUs: Long)(userId: Long, events: Iterator[Event],
                              state: GroupState[UserState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val st = state.get
      // keep the sid counter so later events continue the sequence
      state.update(st.copy(open = None))
      return st.open.iterator.map(s =>
        ClosedSession(userId, s.sid, s.nEvents, s.lastUs - s.startUs, s.sumValue))
    }
    val st = state.getOption.getOrElse(UserState(1L, None))
    val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
    var nextSid = st.nextSid
    var open = st.open
    val out = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val us = micros(e.ts)
      open match {
        case Some(s) if us - s.lastUs > gapUs =>
          out += ClosedSession(userId, s.sid, s.nEvents, s.lastUs - s.startUs, s.sumValue)
          open = Some(OpenSession(nextSid, us, us, 1L, e.value))
          nextSid += 1
        case Some(s) =>
          open = Some(s.copy(lastUs = us, nEvents = s.nEvents + 1,
            sumValue = s.sumValue + e.value))
        case None =>
          open = Some(OpenSession(nextSid, us, us, 1L, e.value))
          nextSid += 1
      }
    }
    state.update(UserState(nextSid, open))
    open.foreach { s =>
      // close the session once the watermark passes last event + gap
      try state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
      catch { case _: UnsupportedOperationException => () /* batch mode */ }
    }
    out.result().iterator
  }

  /** Streaming (or batch) sessionize. For streaming inputs the caller
    * should apply `withWatermark("ts", ...)` first. In batch mode the
    * final open session per user is NOT emitted (it never times out)
    * — matching streaming append semantics. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapUs))(Encoders.product[UserState], Encoders.product[ClosedSession])
  }
}
