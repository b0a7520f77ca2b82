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
  * source. In production the `listPolls` seam is where the HTTP GET
  * would live (reference: etl.py:102-112, 60 s cadence etl.py:240 via
  * the query trigger); offline it lists fixture files, keeping the
  * engine zero-egress.
  *
  * Output schema is Kafka-like — (poll long, value string) — parsing
  * stays downstream in `from_json` with explicit schemas, exactly like
  * the CDC leg.
  */
object PollSource {
  val schema: StructType = StructType(Seq(
    StructField("poll", LongType, nullable = false),
    StructField("value", StringType)))

  /** Poll universe for a path: sorted payload files. */
  def listPolls(path: String): Seq[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile).map(_.getAbsolutePath).sorted
  }
}

class PollSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PollSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PollTable(properties.get("path"))
}

class PollTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"poll($path)"
  override def schema(): StructType = PollSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PollScan(path)
}

class PollScan(path: String) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = PollSource.schema
  override def toBatch: Batch = new Batch {
    private val polls = PollSource.listPolls(path)
    override def planInputPartitions(): Array[InputPartition] =
      polls.zipWithIndex
        .map { case (f, i) => PollPartition(i.toLong, f): InputPartition }
        .toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PollReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PollMicroBatchStream(path)
}

/** Offset = number of polls consumed so far. */
case class PollOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

case class PollPartition(poll: Long, file: String) extends InputPartition

class PollMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = PollOffset(0L)
  override def latestOffset(): Offset =
    PollOffset(PollSource.listPolls(path).size.toLong)
  override def deserializeOffset(json: String): Offset =
    PollOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[PollOffset].n, end.asInstanceOf[PollOffset].n)
    PollSource.listPolls(path)
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
