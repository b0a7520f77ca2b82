package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-session windows on Spark 4's `transformWithState` — the
  * successor-API twin of the built-in `session_window` aggregation,
  * judged against the SAME oracle as `c21_stream_session` (the
  * c33/c36 and c12/c39 twin discipline: one semantic, two engines'
  * worth of machinery, one oracle).
  *
  * Semantics replicated exactly from the built-in operator:
  *
  *  - a session EXTENDS while the inter-event gap is STRICTLY below
  *    `gapUs` (the oracle breaks on `diff >= gap`);
  *  - `session_end = last event + gap`;
  *  - append-mode finalization: ONLY sessions whose end is `<=` the
  *    stream's FINAL watermark (max event time − the watermark
  *    delay) are emitted — the built-in operator leaves later
  *    sessions unfinalized in state, and so does this twin.
  *
  * State is ONE open interval per entity (start, last, n) — bounded
  * by live-entity cardinality like [[Scd2]], never by event volume.
  * A session closed by a later in-stream event emits INLINE; the
  * final open session per entity emits from its event-time timer
  * (fired by the feed's far-future watermark sentinels). Both paths
  * apply the same `end <= finalWmUs` cut, and `finalWmUs` is a
  * deterministic function of the data (staged as a durable sizing
  * scalar by the caller), so the emitted SET is invariant to batch
  * boundaries: a timer can only fire "prematurely" when the
  * watermark passed the session's end, and any later event for that
  * key is then beyond the watermark delay ≥ gap — i.e. it would have
  * broken the session anyway, and both paths emit the same row.
  *
  * Timer discipline is the c36 recipe: delete+register at the
  * INVOCATION boundary only when the fire time moved (timers only
  * fire at batch boundaries, so per-row churn buys nothing and costs
  * four RocksDB CF writes per event).
  */
object SessionTws {
  /** Feed row: event-time `ts` (the watermark column) plus the same
    * instant as exact micros for the integer gap arithmetic.
    */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)

  /** Open-session state. */
  case class OpenSession(start_us: Long, last_us: Long, n: Long)

  /** Emitted session in exact micros; the caller converts to
    * TimestampType at the output boundary (the q45/q121 convention).
    */
  case class SessionRow(user_id: Long, start_us: Long, end_us: Long,
                        n: Long)

  class Processor(gapUs: Long, finalWmUs: Long)
      extends StatefulProcessor[Long, Ev, SessionRow] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def finalized(uid: Long, o: OpenSession): Option[SessionRow] = {
      val end = o.last_us + gapUs
      if (end <= finalWmUs) Some(SessionRow(uid, o.start_us, end, o.n))
      else None
    }

    override def handleInputRows(uid: Long, it: Iterator[Ev],
        tv: TimerValues): Iterator[SessionRow] =
      if (uid < 0L) { it.foreach(_ => ()); Iterator.empty }
      else {
        // ONE store read (ValueStateImpl.get() is null when absent)
        val pre = Option(open.get())
        var cur = pre
        val out = Seq.newBuilder[SessionRow]
        it.toSeq.sortBy(_.ts_us).foreach { e =>
          cur match {
            case Some(o) if e.ts_us - o.last_us < gapUs =>
              cur = Some(OpenSession(o.start_us, e.ts_us, o.n + 1L))
            case Some(o) =>
              finalized(uid, o).foreach(out += _)
              cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
            case None =>
              cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
          }
        }
        val preFire = pre.map(o => (o.last_us + gapUs) / 1000L)
        val curFire = cur.map(o => (o.last_us + gapUs) / 1000L)
        if (preFire != curFire) {
          preFire.foreach(getHandle.deleteTimer)
          curFire.foreach(getHandle.registerTimer)
        }
        if (cur != pre) cur.foreach(open.update)
        out.result().iterator
      }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionRow] = {
      val o = open.get()
      if (o == null) Iterator.empty
      else {
        open.clear()
        finalized(uid, o).iterator
      }
    }
  }

  def sessions(events: Dataset[Ev], gapUs: Long,
               finalWmUs: Long): Dataset[SessionRow] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[SessionRow]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new Processor(gapUs, finalWmUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
