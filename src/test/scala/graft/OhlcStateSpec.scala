package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.OhlcState
import graft.streaming.OhlcState.{OhlcBar, Trade}

/** flatMapGroupsWithState custom-state tests: running OHLCV bars. */
class OhlcStateSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000

  test("running OHLC bar accumulates within a bar and rolls over (streaming state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Trade]
    val bars = OhlcState.ohlcStream(input.toDS(), barMs = H, idleTimeout = None)
    val q = bars.writeStream.format("memory").queryName("ohlc")
      .outputMode("update").start()

    input.addData(
      Trade("BTC", 100.0, 1.0, 0L),
      Trade("BTC", 105.0, 2.0, 60_000L),
      Trade("BTC", 95.0, 1.0, 120_000L),
      Trade("ETH", 50.0, 3.0, 60_000L))
    q.processAllAvailable()
    // next hour → BTC bar rolls over; closed bar emitted + new bar opened
    input.addData(Trade("BTC", 99.0, 1.0, H + 1000L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ohlc").as[OhlcBar].collect()
    // the final state of the first BTC bar (last update emitted for it)
    val btc0 = out.filter(b => b.symbol == "BTC" && b.barStartMs == 0L)
      .maxBy(_.n_trades)
    assert(btc0 === OhlcBar("BTC", 0L, 100.0, 105.0, 95.0, 95.0, 4.0, 3L))
    val btc1 = out.filter(b => b.symbol == "BTC" && b.barStartMs == H)
    assert(btc1.toSeq === Seq(OhlcBar("BTC", H, 99.0, 99.0, 99.0, 99.0, 1.0, 1L)))
    val eth = out.filter(_.symbol == "ETH").maxBy(_.n_trades)
    assert(eth === OhlcBar("ETH", 0L, 50.0, 50.0, 50.0, 50.0, 3.0, 1L))
  }
}
