package graft.streaming

import java.nio.file.Paths
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.ManifestTail

private[streaming] case class CdcLogOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

/** DataSource V2 streaming source over a CdcTable's commit log:
  * one row `(version: long)` per committed version, offsets ARE
  * version numbers (checkpointed by Spark's offset log), discovery by
  * [[ManifestTail]] probe. Used via
  * `spark.readStream.format("graft.streaming.CdcLogSource").load(tableDir)`.
  */
class CdcLogSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcLogSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("cdc-log source requires .load(tableDir)"))
    // layout=consolidated follows a ConsolidatedStore's `commit-<v>`
    // log instead of a CdcTable's `manifest-<v>.json` — same dense
    // version numbering, same `_LATEST` pointer + tail-probe discovery
    new CdcLogTable(path,
      "consolidated".equalsIgnoreCase(properties.get("layout")))
  }
}

object CdcLogSource {
  val Schema: StructType = StructType(Seq(StructField("version", LongType,
    nullable = false)))
}

private[streaming] class CdcLogTable(path: String,
    consolidated: Boolean = false)
    extends Table with SupportsRead {

  override def name(): String = s"cdc-log($path)"
  override def schema(): StructType = CdcLogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = CdcLogSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CdcLogStream(path, consolidated)
    }
}

/** Micro-batch stream whose Offset is the newest delivered version.
  * Implements admission control so Spark hands back the restored
  * offset on restart (probing starts there, not at zero) and
  * AvailableNow by pinning the tail once at query start. */
private[streaming] class CdcLogStream(path: String,
    consolidated: Boolean = false) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val dir = Paths.get(path)
  private val fileFor: Long => String =
    if (consolidated) v => s"commit-$v" else v => s"manifest-$v.json"
  // end bound pinned by prepareForTriggerAvailableNow (AvailableNow
  // runs against a fixed snapshot of the tail; commits landing during
  // the drain belong to the next run)
  @volatile private var pinned: Option[Long] = None

  override def initialOffset(): Offset = CdcLogOffset(-1L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(ManifestTail.latest(dir, -1L, fileFor))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CdcLogOffset].v
    pinned match {
      case Some(end) => CdcLogOffset(math.max(s, end))
      case None =>
        CdcLogOffset(math.max(s, ManifestTail.latest(dir, s, fileFor)))
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcLogOffset].v
    val e = end.asInstanceOf[CdcLogOffset].v
    if (e <= s) Array.empty
    else Array(CdcLogPartition(s + 1, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcLogReaderFactory

  override def deserializeOffset(json: String): Offset =
    CdcLogOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Inclusive version range [first, last] — a handful of longs; one
  * partition keeps delivery trivially ordered. */
private[streaming] case class CdcLogPartition(first: Long, last: Long)
    extends InputPartition

private[streaming] class CdcLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcLogPartition]
    new PartitionReader[InternalRow] {
      private var v = p.first - 1
      override def next(): Boolean = { v += 1; v <= p.last }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](v))
      override def close(): Unit = ()
    }
  }
}
