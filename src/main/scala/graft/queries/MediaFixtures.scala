package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.queries.Tables.t

/** Durable-staged media fixtures — encode ONCE per (sf × testdata
  * fingerprint), read many. The PNG/WAV/GIF encode passes are the
  * most expensive per-row work in the whole suite (codec init, raster
  * build, container write); before staging, each media query re-ran
  * its encode from scratch (~12 s combined per suite run at sf0.1,
  * ~8 s of it redundant). This is the reference's own shape — media
  * is ingested/encoded once and queried many times (etl.py:114-179
  * runs one transform per poll cycle, never re-acquires) — and the
  * same checkpoint discipline the MinHash signature and rank-span
  * stages already use: at 100 TB the encoded corpus is a durable
  * table, and decode-side queries scan it.
  *
  * `Stage.durableFrame` keys on the testdata fingerprint, so a
  * regenerated documents.parquet invalidates every staged payload.
  */
object MediaFixtures {
  /** Grayscale PNG per doc (see [[Multimodal.fixtureFromDocuments]]). */
  def png(s: SparkSession, dir: String): DataFrame =
    Stage.durableFrame(s, "media-png", dir) {
      Multimodal.fixtureFromDocuments(t(s, dir, "documents"))
    }

  /** 8 kHz PCM WAV per doc (see [[Multimodal.audioFixtureFromDocuments]]). */
  def wav(s: SparkSession, dir: String): DataFrame =
    Stage.durableFrame(s, "media-wav", dir) {
      Multimodal.audioFixtureFromDocuments(t(s, dir, "documents"))
    }

  /** Animated GIF per doc (see [[Multimodal.videoFixtureFromDocuments]]). */
  def gif(s: SparkSession, dir: String): DataFrame =
    Stage.durableFrame(s, "media-gif", dir) {
      Multimodal.videoFixtureFromDocuments(t(s, dir, "documents"))
    }
}
