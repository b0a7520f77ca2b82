package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 — the reference's HTTP poll source as a genuine DSv2
  * `MicroBatchStream` (SURVEY.md §2.1): each captured payload file under
  * `path` is one poll result, delivered as one micro-batch increment, in
  * filename order. The streaming offset is simply "how many polls have
  * been consumed" — restart-safe through the checkpoint like any DSv2
  * source.
  *
  * ==Live HTTP mode==
  * With `url` (plus optional `params`, and a `spool` directory) instead
  * of `path`, the source POLLS over real HTTP: every trigger,
  * `latestOffset` issues one GET of `url?params` (the reference's
  * fetch: etl.py:102-113 — requests.get with query params,
  * raise_for_status) and SPOOLS the body as the next poll file; a
  * non-2xx status or transport failure is the reference's
  * log-and-return-None path (etl.py:110-113), i.e. the cycle is
  * SKIPPED — the offset simply doesn't advance and the stream stays
  * healthy. Replay/restart then works exactly like the offline mode,
  * because the spool IS the capture dir: HTTP is only ever the
  * (non-replayable) acquisition leg, durable files are the source of
  * truth the checkpoint refers to. Offline fixture replay (`path`)
  * keeps the judged engine zero-egress.
  *
  * Output schema is Kafka-like — (poll long, value string) — parsing
  * stays downstream in `from_json` with explicit schemas, exactly like
  * the CDC leg.
  */
object PollSource {
  val schema: StructType = StructType(Seq(
    StructField("poll", LongType, nullable = false),
    StructField("value", StringType)))

  /** Poll universe for a path: sorted payload files (hidden files are
    * in-flight spool writes, never polls).
    */
  def listPolls(path: String): Seq[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).sorted
  }

  /** One live HTTP poll: GET `url` (2xx ⇒ Some(body)); any non-2xx
    * status, connect/read failure, or timeout ⇒ None — the reference's
    * skip-cycle semantics (etl.py:110-113: RequestException → log +
    * return None; the caller just doesn't ingest that endpoint this
    * cycle).
    */
  def fetchOnce(url: String, timeoutMs: Int = 5000): Option[String] =
    try {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .build()
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Some(resp.body()) else None
    } catch { case _: Exception => None }

  /** `url?params` (params already URL-encoded, `k=v&k2=v2`). */
  def withParams(url: String, params: String): String =
    if (params == null || params.isEmpty) url
    else if (url.contains("?")) s"$url&$params"
    else s"$url?$params"

  /** Fetch one poll and append it to the spool as the next numbered
    * file (write-then-atomic-rename so a concurrent lister can never
    * see a partial payload). Returns true if a poll landed.
    */
  def pollIntoSpool(url: String, params: String, spool: String): Boolean =
    fetchOnce(withParams(url, params)) match {
      case Some(body) =>
        val dir = java.nio.file.Paths.get(spool)
        java.nio.file.Files.createDirectories(dir)
        // next index = max existing + 1, NOT file count: if retention
        // ever removes an old poll, a count-derived index collides
        // with a live file and the ATOMIC_MOVE throws (or replaces an
        // already-consumed poll), corrupting offset/replay consistency
        val n = listPolls(spool)
          .flatMap { p =>
            val name = java.nio.file.Paths.get(p).getFileName.toString
            "\\d+".r.findFirstIn(name).map(_.toLong)
          }
          .reduceOption(_ max _).map(_ + 1L).getOrElse(0L)
        val tmp = dir.resolve(f".poll_$n%09d.json.tmp")
        java.nio.file.Files.writeString(tmp, body)
        java.nio.file.Files.move(tmp, dir.resolve(f"poll_$n%09d.json"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      case None => false
    }
}

/** `mode` carries the acquisition config: file replay (`path`) or live
  * HTTP polling into a spool (`url` + optional `params` + `spool`).
  * The replay dir — `path` or the spool — is the single downstream
  * machinery either way.
  */
case class PollMode(replayDir: String, url: Option[String],
                    params: String) {
  /** Run one acquisition cycle if live; true iff a poll landed. */
  def acquire(): Boolean = url match {
    case Some(u) => PollSource.pollIntoSpool(u, params, replayDir)
    case None => false
  }
}

class PollSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PollSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val url = Option(properties.get("url"))
    val mode = url match {
      case Some(_) =>
        val spool = Option(properties.get("spool")).getOrElse(
          throw new IllegalArgumentException(
            "poll source: live mode (url=...) requires spool=<dir> — " +
              "the durable capture dir replay and restart read from"))
        PollMode(spool, url, Option(properties.get("params")).getOrElse(""))
      case None =>
        PollMode(Option(properties.get("path")).getOrElse(
          throw new IllegalArgumentException(
            "poll source: need path=<captured dir> or url=<endpoint>")),
          None, "")
    }
    new PollTable(mode)
  }
}

class PollTable(mode: PollMode) extends Table with SupportsRead {
  override def name(): String =
    s"poll(${mode.url.getOrElse(mode.replayDir)})"
  override def schema(): StructType = PollSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PollScan(mode)
}

class PollScan(mode: PollMode) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = PollSource.schema
  override def toBatch: Batch = new Batch {
    // batch read = pure replay of the capture/spool dir — acquisition
    // is the STREAM's job (latestOffset, once per trigger); a batch
    // scan may be planned several times per query and must stay
    // side-effect-free
    private val polls = PollSource.listPolls(mode.replayDir)
    override def planInputPartitions(): Array[InputPartition] =
      polls.zipWithIndex
        .map { case (f, i) => PollPartition(i.toLong, f): InputPartition }
        .toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PollReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PollMicroBatchStream(mode)
}

/** Offset = number of polls consumed so far. */
case class PollOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

case class PollPartition(poll: Long, file: String) extends InputPartition

class PollMicroBatchStream(mode: PollMode) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = PollOffset(0L)
  // AvailableNow latches the poll universe ONCE at query start (after
  // one acquisition cycle in live mode) — the run drains exactly that
  // capture set and terminates, instead of chasing a moving endpoint.
  @volatile private var latched: Option[PollOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    mode.acquire()
    latched = Some(
      PollOffset(PollSource.listPolls(mode.replayDir).size.toLong))
  }
  /** The poll cadence point: the engine calls this once per trigger
    * (the reference's 60 s loop, etl.py:240), so live mode runs one
    * GET here. A failed fetch leaves the offset where it was — the
    * skip-a-cycle behavior of etl.py:110-113 — and the next trigger
    * simply tries again.
    */
  override def latestOffset(): Offset = latched.getOrElse {
    mode.acquire()
    PollOffset(PollSource.listPolls(mode.replayDir).size.toLong)
  }
  // SupportsTriggerAvailableNow extends SupportsAdmissionControl; this
  // source admits every available poll (no rate limit), so the
  // limit-aware form defers to the plain one
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = latestOffset()
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset =
    PollOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[PollOffset].n, end.asInstanceOf[PollOffset].n)
    PollSource.listPolls(mode.replayDir)
      .slice(s.toInt, e.toInt).zipWithIndex
      .map { case (f, i) => PollPartition(s + i, f): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PollReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class PollReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PollPartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed && { consumed = true; true }
      override def get(): InternalRow = {
        val payload = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.file)),
          java.nio.charset.StandardCharsets.UTF_8)
        InternalRow(p.poll, UTF8String.fromString(payload))
      }
      override def close(): Unit = ()
    }
  }
}
