package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{CdcTable, Decode}
import graft.sources.DatastreamAvro

/** Structured-Streaming CDC pipeline: avro file stream → decode →
  * per-batch soft-delete merge, with exactly-once per file from the
  * stream checkpoint (replacing the reference's hand-rolled offset
  * state machine, DatastreamEventReader.java:302-370).
  *
  * Design notes vs the reference:
  *  - 30 s default trigger = the reference's scan cadence
  *    (DatastreamEventReader.java:95,170); tests use AvailableNow.
  *  - No snapshot→CDC phase machine: the merge's strictly-greater
  *    sort-key guard makes apply order-insensitive, so backfill and
  *    CDC files can interleave freely (the reference needed dump-first
  *    gating only because it emitted events in arrival order,
  *    ":429-467"). Late files within the 3-day SLA window simply
  *    replay idempotently.
  *  - One stream can host many tables (partitioned by table name) —
  *    at 100 TB / thousands of tables, per-table driver state is the
  *    scaling bottleneck the reference would hit; here state lives in
  *    the checkpoint + the merge targets.
  */
object CdcStream {

  val DefaultTrigger: Trigger = Trigger.ProcessingTime("30 seconds")

  case class Pipeline(query: StreamingQuery, table: CdcTable)

  /** Start streaming `sourceGlob` avro files into `table`.
    *
    * @param schema envelope schema (from
    *        [[DatastreamAvro.sparkSchema]] of a sample file — explicit,
    *        never runtime-inferred, per the reference's declared-schema
    *        policy)
    */
  def start(
      spark: SparkSession,
      sourceGlob: String,
      schema: StructType,
      table: CdcTable,
      checkpoint: String,
      decodeOpts: Decode.Options = Decode.Options(),
      trigger: Trigger = Trigger.AvailableNow(),
      maintenanceEvery: Int = 0,
      modifiedAfter: Option[java.sql.Timestamp] = None,
      maxFileAge: Option[String] = None): Pipeline = {
    // allowlist scoping here is row-level only (inside the decode);
    // file-level pruning needs the filename-keyed layout asserted —
    // see CdcRouter(filenameKeyed = true)
    val envelope = DatastreamAvro.readStream(spark, sourceGlob, schema,
      modifiedAfter = modifiedAfter, maxFileAge = maxFileAge)
    val events = Decode.changeEvents(envelope, decodeOpts)
    val query = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          table.applyBatch(batch, id)
          // periodic in-stream maintenance: the reference runs its
          // TTL/cleanup task every 3 scan cycles (90 s vs 30 s); here
          // compaction+vacuum piggyback on every Nth commit
          if (maintenanceEvery > 0 && (id + 1) % maintenanceEvery == 0) {
            table.compact()
            table.vacuum(keepVersions = 2)
          }
          ()
        }
      }
      .start()
    Pipeline(query, table)
  }

  /** Start from a validated [[CdcConfig]]. */
  def start(spark: SparkSession, config: CdcConfig,
      schema: StructType): Pipeline = {
    val c = config.validated()
    val table = new CdcTable(spark, c.tablePath, c.primaryKeys, c.numBuckets)
    start(spark, c.sourceGlob, schema, table, c.checkpoint,
      c.decodeOptions, c.trigger, c.maintenanceEvery,
      c.modifiedAfter.map(java.sql.Timestamp.valueOf), c.maxFileAge)
  }

  /** Start under a [[SourceAdmin]]-managed stream: provision the
    * control-plane stream if absent, drive it to RUNNING (create →
    * start, paused → resume), then attach the pipeline to its
    * provisioned source location — the reference's startup flow, where
    * the plugin creates/starts the Datastream stream before reading
    * its bucket (DatastreamDeltaSource + util/Utils.java:548-561).
    * [[pauseManaged]] stops the query and pauses the stream; a later
    * startManaged resumes from the checkpoint exactly-once. */
  def startManaged(
      spark: SparkSession,
      admin: SourceAdmin,
      streamId: String,
      sourceGlob: String,
      schema: StructType,
      table: CdcTable,
      checkpoint: String,
      decodeOpts: Decode.Options = Decode.Options(),
      trigger: Trigger = Trigger.AvailableNow(),
      maintenanceEvery: Int = 0): Pipeline = {
    if (!admin.exists(streamId)) admin.create(streamId, sourceGlob)
    admin.state(streamId) match {
      case SourceAdmin.Created => admin.start(streamId)
      case SourceAdmin.Paused => admin.resume(streamId)
      case SourceAdmin.Running => ()
    }
    admin.awaitState(streamId, SourceAdmin.Running)
    start(spark, admin.sourceGlob(streamId), schema, table, checkpoint,
      decodeOpts, trigger, maintenanceEvery)
  }

  /** Stop the pipeline's query and pause the control-plane stream. */
  def pauseManaged(p: Pipeline, admin: SourceAdmin, streamId: String): Unit = {
    p.query.stop()
    p.query.awaitTermination()
    admin.pause(streamId)
    admin.awaitState(streamId, SourceAdmin.Paused)
  }

  /** Run a pipeline to completion over currently-available files
    * (micro-batch drain; used by tests and backfills). */
  def drain(p: Pipeline): Unit = {
    p.query.processAllAvailable()
    p.query.stop()
    p.query.awaitTermination()
  }
}
