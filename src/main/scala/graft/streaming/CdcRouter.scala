package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{CdcTable, Decode}
import graft.sources.DatastreamAvro

/** Multiplexed multi-table CDC: ONE stream carries every table's
  * change files; each micro-batch routes events to per-table merge
  * targets by `table_name`. This is the shape that scales to
  * thousands of tables (SURVEY §7.4): per-table streams multiply
  * driver/checkpoint overhead a thousandfold, while one multiplexed
  * stream keeps a single file log and lets the per-table merges run
  * as ordinary jobs inside the batch.
  *
  * Tables are created lazily on first sight (CREATE_TABLE lands in
  * the new table's DDL log), mirroring the reference's
  * emit-create-before-first-event contract
  * (DatastreamEventReader.java:558-570).
  */
class CdcRouter(
    spark: SparkSession,
    rootPath: String,
    pkColsFor: String => Seq[String],
    numBuckets: Int = 16) {

  private val tables = scala.collection.concurrent.TrieMap.empty[String, CdcTable]

  def table(name: String): CdcTable =
    tables.getOrElseUpdate(name,
      new CdcTable(spark, s"$rootPath/$name", pkColsFor(name), numBuckets))

  def knownTables: Seq[String] = tables.keys.toSeq.sorted

  /** Apply one (possibly multi-table) batch of decoded change events. */
  def applyBatch(events: DataFrame, batchId: Long): Unit = {
    val names = events.select(col("table_name")).distinct()
      .collect().map(_.getString(0)).sorted
    names.foreach { name =>
      table(name).applyBatch(
        events.filter(col("table_name") === name), batchId)
    }
  }

  /** Stream a directory of avro change files into per-table targets. */
  def start(sourceGlob: String, schema: StructType, checkpoint: String,
      decodeOpts: Decode.Options = Decode.Options(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val events = Decode.changeEvents(
      DatastreamAvro.readStream(spark, sourceGlob, schema), decodeOpts)
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) applyBatch(batch, id)
      }
      .start()
  }
}
