package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-dup ADMISSION over LSH band keys: the ingest-time
  * form of MinHash-LSH dedup (north star §2.6 E1 × C6). Batch dedup
  * answers "which docs in the corpus are near-dups"; an ingestion
  * pipeline needs the ONLINE question — "does the arriving doc
  * near-collide with anything already admitted" — decided as the doc
  * arrives, against state that persists across micro-batches and
  * restarts (checkpointed state store).
  *
  * State design for scale: ONE long per band key — the minimum doc id
  * that has ever carried the band — not a doc list, so state size is
  * bounded by the distinct-band domain regardless of corpus size, and
  * each micro-batch pays one state lookup/update per touched band
  * (shuffle on band key, the same partitioning batch LSH banding
  * uses). A doc is flagged iff some band of it was first seen on a
  * SMALLER doc id; with doc-id-ordered arrival this equals the batch
  * definition "shares a band with an earlier doc", which is what the
  * oracle checks. Flags ride per (doc, band) and the sink rolls them
  * up per doc.
  */
object BandAdmission {

  case class BandRow(doc_id: Long, band: String)
  case class BandFlag(doc_id: Long, band: String, dup: Boolean)

  /** Pure per-band fold: rows sorted by doc id, each flagged against
    * the running minimum (state-carried across batches). Returns the
    * flags and the new minimum.
    */
  def fold(band: String, mn0: Long,
           rows: Seq[BandRow]): (Seq[BandFlag], Long) = {
    var mn = mn0
    val out = rows.sortBy(_.doc_id).map { r =>
      val f = BandFlag(r.doc_id, band, mn < r.doc_id)
      if (r.doc_id < mn) mn = r.doc_id
      f
    }
    (out, mn)
  }

  /** Per-band running-minimum admission: rows of one micro-batch are
    * folded in doc-id order, so intra-batch earlier docs flag later
    * ones exactly as cross-batch state does.
    */
  def flagBatch(band: String, rows: Iterator[BandRow],
                state: GroupState[Long]): Iterator[BandFlag] = {
    val (out, mn) =
      fold(band, state.getOption.getOrElse(Long.MaxValue), rows.toSeq)
    if (mn != Long.MaxValue) state.update(mn)
    out.iterator
  }

  def flagStream(rows: Dataset[BandRow]): Dataset[BandFlag] = {
    implicit val flagEnc = Encoders.product[BandFlag]
    implicit val strEnc = Encoders.STRING
    implicit val longEnc = Encoders.scalaLong
    rows.groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(flagBatch)
  }

  /** Band row with an event-time column for the TTL'd variant:
    * `ts` = (doc_id+1) seconds, so the µs→ms watermark floor is
    * EXACT ((doc_id+1)·1000 ms), the eviction boundary has no
    * rounding ambiguity, and doc 0 never sits at epoch 0 (a zero
    * event time is dropped by the initial-watermark late filter).
    */
  case class BandRowT(doc_id: Long, band: String,
    ts: java.sql.Timestamp)

  /** Per-band admission state for the horizon form: the running
    * chain minimum and the chain's latest doc id.
    */
  case class MinLast(mn: Long, last: Long)

  /** HORIZON-bounded admission with state TTL — the production form
    * of [[flagStream]] for an unbounded ingest: a doc is flagged iff
    * its band's PREVIOUS occurrence is within `horizon` doc ids
    * (occurrence chains split where the gap exceeds the horizon; a
    * doc is a near-dup iff it is not first in its chain — the dedup
    * window every rolling corpus ingest actually runs, since
    * "collides with something admitted years ago and since expired"
    * is not a duplicate). The gap test runs IN the handler, so the
    * semantics never depend on micro-batch timing; the
    * `EventTimeTimeout` eviction is pure state hygiene that can never
    * change a flag — an evicted band's next arrival has, by the
    * timeout condition, a gap exceeding the horizon and would reset
    * its chain anyway. State is therefore bounded by the bands ACTIVE
    * WITHIN THE HORIZON, not the all-time band domain — the
    * unbounded-growth defect a NoTimeout admission has at 100 TB.
    *
    * Evictions are audited in-band like c33: a mid-stream timeout
    * (watermark ≤ `drainAfterMs`) emits doc_id = −1, the final drain
    * emits doc_id = −2 — so evicted + live-at-end counts partition
    * the band domain and the state-store size is judged. Rows with
    * doc_id < 0 are watermark-bearing sentinels and never create
    * state.
    */
  def flagStreamTtl(rows: Dataset[BandRowT], horizon: Long,
                    drainAfterMs: Long): Dataset[BandFlag] = {
    implicit val flagEnc = Encoders.product[BandFlag]
    implicit val stEnc = Encoders.product[MinLast]
    implicit val strEnc = Encoders.STRING
    rows.groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (band: String, it: Iterator[BandRowT],
         state: GroupState[MinLast]) =>
          if (state.hasTimedOut) {
            val id =
              if (state.getCurrentWatermarkMs() > drainAfterMs) -2L
              else -1L
            state.remove()
            Iterator.single(BandFlag(id, band, dup = false))
          } else {
            // a band's batch slice is bounded (docs carrying this band
            // in one micro-batch), so materializing it is safe
            val rows = it.toSeq.filter(_.doc_id >= 0L)
            if (rows.isEmpty) Iterator.empty // sentinel: watermark only
            else {
              var st = state.getOption
                .getOrElse(MinLast(Long.MaxValue, Long.MinValue))
              val out = Seq.newBuilder[BandFlag]
              rows.sortBy(_.doc_id).foreach { r =>
                val mn =
                  if (st.last != Long.MinValue &&
                      r.doc_id - st.last > horizon) Long.MaxValue
                  else st.mn
                out += BandFlag(r.doc_id, band, mn < r.doc_id)
                st = MinLast(math.min(mn, r.doc_id), r.doc_id)
              }
              state.update(st)
              state.setTimeoutTimestamp((st.last + 1 + horizon) * 1000L)
              out.result().iterator
            }
          }
      }
  }
}
