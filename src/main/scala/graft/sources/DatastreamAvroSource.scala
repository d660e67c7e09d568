package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 form of the Datastream Avro source:
  *
  * {{{
  *   spark.read.format("graft.sources.DatastreamAvroSource")
  *     .load("/path/to/change-files")   // dir or glob
  * }}}
  *
  * One input partition per file (change files are small by design —
  * the reference rotates them at 15 s / 1 MB, util/Utils.java:105-106 —
  * so file granularity IS the right split granularity); each reader
  * streams its file through the same schema-guided decoder as
  * [[DatastreamAvro]]. Schema is inferred once on the driver from the
  * first file's writer schema, or passed explicitly with `.schema()`
  * (the reference's declared-schema policy).
  */
class DatastreamAvroSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("paths"))
      .map(p => p.stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
      .getOrElse(Option(options.get("path")).toSeq)
    raw.filter(_.nonEmpty)
  }

  /** Expand globs to concrete file paths using the Hadoop FS.
    * Zero-length files (folder markers, in-flight blobs) are skipped
    * at listing time, mirroring the reference's `blob.getSize() > 0`
    * guard (DatastreamEventReader.java:594-598). */
  private def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      Option(fs.globStatus(path)).toSeq.flatten.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(s => s.isFile && s.getLen > 0).map(_.getPath)
        else if (st.getLen > 0) Seq(st.getPath)
        else Nil
      }
    }.map(_.toString).sorted
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = listFiles(options)
    require(files.nonEmpty, s"no avro files match ${paths(options)}")
    DatastreamAvro.sparkSchema(files.head)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DatastreamAvroTable(schema,
      listFiles(new CaseInsensitiveStringMap(properties)))
}

private[sources] class DatastreamAvroTable(
    schema: StructType, files: Seq[String]) extends Table with SupportsRead {

  override def name(): String = s"datastream-avro(${files.size} files)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns {
      private var required: StructType = schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        files.map(f => AvroFilePartition(f): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new AvroReaderFactory(required)
    }
}

private[sources] case class AvroFilePartition(path: String) extends InputPartition

private[sources] class AvroReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].path
    new PartitionReader[InternalRow] {
      private val rows = DatastreamAvro.decodeLocalFile(file, schema)
      private val convert = CatalystTypeConverters.createToCatalystConverter(schema)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = convert(rows.next()).asInstanceOf[InternalRow]; true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
