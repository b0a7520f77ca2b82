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
}
