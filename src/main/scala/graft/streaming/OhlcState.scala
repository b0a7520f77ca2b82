package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via `flatMapGroupsWithState` (north star
  * §2.6 streaming ops): a per-symbol running OHLCV accumulator — the
  * streaming re-expression of the reference's klines bars
  * (reference: etl.py:146-158, 1-hour interval etl.py:228), but built
  * incrementally from a trade stream instead of polled pre-aggregated
  * bars.
  *
  * State design for scale: O(1) per (symbol, bar) — four doubles, a
  * volume and a count; no event buffering. A processing-time timeout
  * expires idle symbols so state can't grow unboundedly (the
  * event-time-watermark variant would use
  * `GroupStateTimeout.EventTimeTimeout`). Emission is one updated bar
  * per symbol per micro-batch — update-mode semantics.
  */
object OhlcState {

  case class Trade(symbol: String, price: Double, quantity: Double,
                   epochMs: Long)

  case class OhlcBar(symbol: String, barStartMs: Long, open: Double,
                     high: Double, low: Double, close: Double,
                     volume: Double, n_trades: Long)

  /** Fold one micro-batch's trades (sorted by time within the group)
    * into the running bar for their 1-hour bucket. Bar rollover emits
    * the closed bar(s) and keeps only the live one in state.
    */
  def updateBars(barMs: Long, idleTimeout: Option[String])(
      symbol: String, trades: Iterator[Trade],
      state: GroupState[OhlcBar]): Iterator[OhlcBar] = {
    val sorted = trades.toSeq.sortBy(t => (t.epochMs, t.price))
    if (sorted.isEmpty) {
      if (state.hasTimedOut) {
        val last = state.getOption
        state.remove()
        return last.iterator
      }
      return Iterator.empty
    }
    var emitted = Vector.empty[OhlcBar]
    var cur = state.getOption.orNull
    sorted.foreach { t =>
      val barStart = t.epochMs / barMs * barMs
      if (cur == null || cur.barStartMs != barStart) {
        if (cur != null) emitted :+= cur // bar rollover: close the old bar
        cur = OhlcBar(symbol, barStart, t.price, t.price, t.price, t.price,
          t.quantity, 1L)
      } else {
        cur = cur.copy(
          high = math.max(cur.high, t.price),
          low = math.min(cur.low, t.price),
          close = t.price,
          volume = cur.volume + t.quantity,
          n_trades = cur.n_trades + 1)
      }
    }
    state.update(cur)
    idleTimeout.foreach(state.setTimeoutDuration)
    (emitted :+ cur).iterator
  }

  /** Wire a trade stream into the stateful bar builder. `idleTimeout`
    * (production default "1 hour") evicts state for symbols that stop
    * trading; None disables timeouts (deterministic tests — a pending
    * processing-time timeout keeps the no-data trigger loop alive).
    */
  def ohlcStream(trades: Dataset[Trade],
                 barMs: Long = 3600L * 1000,
                 idleTimeout: Option[String] = Some("1 hour")): Dataset[OhlcBar] = {
    implicit val barEnc = Encoders.product[OhlcBar]
    implicit val strEnc = Encoders.STRING
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    trades
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Update(), timeoutConf)(
        updateBars(barMs, idleTimeout))
  }
}
