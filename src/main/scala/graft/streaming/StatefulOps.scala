package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Arbitrary per-key streaming state on Spark 4's `transformWithState`
  * API (the successor of `flatMapGroupsWithState`, RocksDB-backed:
  * state lives off-heap and spills to disk, so per-key state scales to
  * the store, not the JVM heap — the 100 TB-of-keys shape).
  *
  * The processor here is the engine's "latest price delta" surface: the
  * reference's `latest_prices` table keeps only the current value per
  * symbol (reference: etl.py:114-122, cassandra-init.cql:4); a stream
  * consumer usually also wants the previous value and the update count,
  * which is exactly one ValueState per key.
  */
object StatefulOps {

  case class KeyedValue(key: String, value: Double)

  /** `has_prev` is false on a key's first event (prev is then 0.0). */
  case class Delta(key: String, prev: Double, has_prev: Boolean,
                   value: Double, n_seen: Long)

  /** One ValueState[(lastValue, count)] per key; each input row emits
    * the transition (prev → value) with the running update count.
    */
  class DeltaProcessor extends StatefulProcessor[String, KeyedValue, Delta] {
    @transient private var last: ValueState[(Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState("last",
        Encoders.product[(Double, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
                                 timerValues: TimerValues): Iterator[Delta] =
      rows.map { r =>
        val (prev, n) = if (last.exists()) last.get() else (0.0, 0L)
        last.update((r.value, n + 1))
        Delta(key, prev, n > 0, r.value, n + 1)
      }
  }

  /** Delta stream over a keyed value stream. Requires the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass`).
    */
  def deltaStream(ds: Dataset[KeyedValue]): Dataset[Delta] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new DeltaProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Sequenced input for the order-deterministic variant: `seq` is a
    * per-key-unique, monotone event sequence (an offset / event id).
    */
  case class SeqValue(key: String, seq: Long, value: Double)

  case class SeqDelta(key: String, seq: Long, prev: Double,
                      has_prev: Boolean, value: Double, n_seen: Long)

  /** Same ValueState fold as [[DeltaProcessor]], but each micro-batch's
    * rows for a key are applied in `seq` order, making the emitted
    * transition chain independent of shuffle/file arrival order — the
    * property that lets a DuckDB lag()/row_number() oracle replay it.
    *
    * The sort buffers ONE key's rows for ONE micro-batch (bounded by
    * the trigger interval, never by history — state itself stays one
    * (value, count) pair per key in RocksDB), the same per-batch
    * footprint a session-window merge pays.
    */
  class OrderedDeltaProcessor
      extends StatefulProcessor[String, SeqValue, SeqDelta] {
    @transient private var last: ValueState[(Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState("last",
        Encoders.product[(Double, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SeqValue],
                                 timerValues: TimerValues): Iterator[SeqDelta] =
      rows.toArray.sortBy(_.seq).iterator.map { r =>
        val (prev, n) = if (last.exists()) last.get() else (0.0, 0L)
        last.update((r.value, n + 1))
        SeqDelta(key, r.seq, prev, n > 0, r.value, n + 1)
      }
  }

  def orderedDeltaStream(ds: Dataset[SeqValue]): Dataset[SeqDelta] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new OrderedDeltaProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  case class KeyCount(key: String, cnt: Long)

  /** Monotone per-key counter: one ValueState[Long] per key, each
    * invocation adds the batch's rows and emits the NEW running total
    * (ONE row per key per micro-batch, not per input row). Counts only
    * grow, so an append-only sink's final image is `max(cnt)` per key —
    * a replayed batch re-appends an already-emitted total and the max
    * absorbs it, giving exactly-once totals without an update-mode
    * sink. ONE state read + one write per key-invocation (absent
    * ValueState.get() returns null, which unboxes to 0L — the
    * absent-count semantics, no paired exists() probe).
    */
  class KeyCountProcessor extends StatefulProcessor[String, String, KeyCount] {
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState("n", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[String],
                                 timerValues: TimerValues): Iterator[KeyCount] = {
      var add = 0L
      while (rows.hasNext) { rows.next(); add += 1 }
      val cur = n.get() + add
      n.update(cur)
      Iterator.single(KeyCount(key, cur))
    }
  }

  /** Running per-key counts over a key stream. Requires the RocksDB
    * state store provider (same contract as [[deltaStream]]).
    */
  def keyCountStream(ds: Dataset[String]): Dataset[KeyCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(identity)
      .transformWithState(new KeyCountProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  case class KeyWeight(key: String, w: Long)
  case class KeySum(key: String, total: Long)

  /** Monotone per-key WEIGHTED accumulator — [[KeyCountProcessor]]'s
    * shape with the batch's weight sum added instead of its row count
    * (per-source token totals, byte totals, spend counters). Same
    * exactly-once discipline: totals only grow, each key-invocation
    * emits the new running total once, and an append sink's final
    * image is `max(total)` per key. Nonnegative weights are the
    * caller's contract — a negative weight would break the
    * monotonicity the max-collapse relies on.
    */
  class KeySumProcessor
      extends StatefulProcessor[String, KeyWeight, KeySum] {
    @transient private var s: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      s = getHandle.getValueState("s", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyWeight],
                                 timerValues: TimerValues): Iterator[KeySum] = {
      var add = 0L
      while (rows.hasNext) add += rows.next().w
      val cur = s.get() + add
      s.update(cur)
      Iterator.single(KeySum(key, cur))
    }
  }

  /** Running per-key weight totals over a (key, weight) stream.
    * Requires the RocksDB state store provider (same contract as
    * [[deltaStream]]).
    */
  def keySumStream(ds: Dataset[KeyWeight]): Dataset[KeySum] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new KeySumProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
