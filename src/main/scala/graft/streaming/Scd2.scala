package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming SCD2 (slowly-changing-dimension type 2) maintenance —
  * the history table a CDC warehouse keeps per key, built INCREMENTALLY
  * from the change stream instead of re-windowing the full log
  * (reference analog: the connector's change feed landing in a
  * versioned table, debezium-config.json's single-table capture).
  * This is the streaming twin of the batch `Sinks.scd2History`
  * (lead-over-log), judged against the SAME oracle: per key, each
  * non-delete change CLOSES the previous open interval at its own
  * timestamp and opens a new one; a delete closes without opening;
  * the intervals still open when the stream drains are emitted with
  * `effective_to = null` / `is_current = true`.
  *
  * State is ONE open interval per live key — bounded by the live key
  * population, not by history length (closed intervals are emitted
  * downstream immediately, never retained), which is what makes the
  * operator viable over months of CDC at 100 TB: the batch form
  * re-sorts the whole log per refresh, the streaming form touches
  * only the keys present in each micro-batch.
  *
  * Determinism contract (the c39 feed discipline): each change
  * generation arrives in its own chunk with event time (gen+1) s
  * (epoch 0 is dropped by the initial-watermark late filter), so
  * per-key arrival order equals log order; rows within a batch are
  * sorted by `ts_g` anyway. The drain is a far-future event-time
  * timeout (re-armed on every touch, fired by the watermark-bearing
  * sentinel), the c33/c36 recipe.
  */
object Scd2 {
  /** One change-log record: `op` in r/u/d, `ts_g` the log ordinal
    * (emitted in the output), event-time `ts` carried separately by
    * the caller's watermark column.
    */
  case class Change(c_custkey: Long, c_acctbal: Option[Double],
                    op: String, ts_g: Long)

  /** Open-interval state: the current dimension row version. `bal`
    * is Option so a null balance on an r/u change round-trips as NULL,
    * exactly like the batch c12 oracle (not coerced to 0.0).
    */
  case class Open(bal: Option[Double], from: Long)

  case class Version(c_custkey: Long, c_acctbal: Option[Double],
                     effective_from: Long, effective_to: Option[Long],
                     is_current: Boolean)

  /** @param drainFireMs event-time timeout timestamp for the final
    *                    drain — must exceed every data event time and
    *                    precede the sentinel's watermark.
    */
  def history(changes: Dataset[Change], drainFireMs: Long)
      : Dataset[Version] = {
    implicit val chEnc = Encoders.product[Change]
    implicit val stEnc = Encoders.product[Open]
    implicit val outEnc = Encoders.product[Version]
    implicit val keyEnc = Encoders.scalaLong
    changes.groupByKey(_.c_custkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val o = state.get
            state.remove()
            Iterator.single(
              Version(key, o.bal, o.from, None, is_current = true))
          } else if (key < 0L) {
            it.foreach(_ => ()) // watermark-bearing sentinel: no state
            Iterator.empty
          } else {
            val out = Seq.newBuilder[Version]
            it.toSeq.sortBy(_.ts_g).foreach { ch =>
              state.getOption.foreach { o =>
                out += Version(key, o.bal, o.from, Some(ch.ts_g),
                  is_current = false)
              }
              if (ch.op == "d") { if (state.exists) state.remove() }
              else state.update(Open(ch.c_acctbal, ch.ts_g))
            }
            // re-arm on every invocation that leaves state behind
            // (timeout config does not survive an invocation)
            if (state.exists) state.setTimeoutTimestamp(drainFireMs)
            out.result().iterator
          }
      }
  }
}
