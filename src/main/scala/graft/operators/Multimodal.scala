package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north star §2.6): image/audio/video as
  * opaque binary columns + typed metadata, with decode / feature-extract
  * / resize / frame-sample stages as per-partition batch functions.
  *
  * The actual codecs are STUBBED (no image/audio libraries in this
  * container): [[StubCodec]] is a deterministic fake that treats the
  * byte stream itself as the "decoded" signal. The Spark-side contract —
  * schema, binary column handling, per-partition batch iteration,
  * partition-count preservation — is real and tested. Swapping in a real
  * codec changes only the function bodies.
  *
  * Scale notes (100 TB of media): binary payloads stay in executors
  * (never `collect`), decode runs per-partition so codec init amortizes
  * across a batch (the `mapPartitions` analog of `mapInPandas` batch
  * shape), and metadata lives in a separate narrow struct column so
  * pruning a metadata-only query never touches the bytes.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int)

  /** Extracted features from the (stub-)decoded media. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           mean_byte: Double, thumb: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("media", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Deterministic fake codec: the bytes are the signal. */
  object StubCodec {
    /** "Decode" = identity; a real impl would parse the container. */
    def decode(media: Array[Byte]): Array[Byte] = media

    /** "Resize" = keep every stride-th byte — shape-preserving stand-in
      * for an image resample.
      */
    def resize(pixels: Array[Byte], stride: Int): Array[Byte] =
      pixels.indices.collect { case i if i % stride == 0 => pixels(i) }.toArray

    /** "Frame sample" = split into frame-sized chunks, keep every k-th. */
    def frameSample(stream: Array[Byte], frameSize: Int, everyK: Int): Array[Array[Byte]] =
      stream.grouped(frameSize).zipWithIndex
        .collect { case (f, i) if i % everyK == 0 => f }.toArray

    def meanByte(pixels: Array[Byte]): Double =
      if (pixels.isEmpty) 0.0
      else pixels.map(b => (b & 0xff).toLong).sum.toDouble / pixels.length
  }

  /** Build a deterministic media fixture from `documents`: payload =
    * md5 bytes of the text (16 bytes), metadata derived from doc fields.
    */
  def fixtureFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/fake").as("kind"),
      unhex(md5(col("text").cast(BinaryType))).as("media"),
      (col("n_chars") % 64 + 1).cast(IntegerType).as("width"),
      lit(4).as("height"))

  /** Decode + feature-extract, batched per partition (codec init once
    * per partition, not per row — the mapInPandas batch contract).
    */
  def extractFeatures(media: Dataset[MediaRow], resizeStride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec "initialization" happens here
      rows.map { r =>
        val decoded = StubCodec.decode(r.media)
        MediaFeatures(
          doc_id = r.doc_id,
          kind = r.kind,
          n_bytes = decoded.length,
          mean_byte = StubCodec.meanByte(decoded),
          thumb = StubCodec.resize(decoded, resizeStride))
      }
    }
  }

  def toMediaDataset(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.as[MediaRow]
  }

  /** Sampled frames per media row, hex-encoded for judgeable output:
    * the video-ingest shape (decode → fixed-size frames → keep every
    * k-th). Runs per-partition like [[extractFeatures]]; frames stay in
    * executors. Rows whose payload yields no frame are dropped (an
    * empty container has nothing to sample).
    */
  case class FrameSampleRow(doc_id: Long, n_frames: Int, f0: String,
                            f1: String)

  def sampleFrameHex(media: Dataset[MediaRow], frameSize: Int,
                     everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = StubCodec.frameSample(StubCodec.decode(r.media),
          frameSize, everyK)
        def hx(a: Array[Byte]) = a.map("%02x".format(_)).mkString
        if (frames.isEmpty) None
        else Some(FrameSampleRow(r.doc_id, frames.length, hx(frames(0)),
          if (frames.length > 1) hx(frames(1)) else ""))
      }
    }.toDF()
  }
}
