package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.DatastreamAvro

/** Envelope → change-event decode, the reference's
  * DatastreamEventConsumer semantics re-expressed as one declarative
  * (fully codegen'd) DataFrame transform:
  *
  *  - snapshot classification: file path or read_method contains
  *    "backfill" (DatastreamEventConsumer.java:206-208; the fixtures
  *    carry read_method=oracle-backfill with neutral filenames)
  *  - op normalization: UPDATE-DELETE→DELETE, UPDATE-INSERT→UPDATE,
  *    snapshot/absent→INSERT (":226-236,297-308")
  *  - DML blacklist filter (":228-236")
  *  - payload column projection (":103-105")
  *  - previous_row := row for UPDATE (no before-image, ":249-254")
  *  - typed sort key struct (source_timestamp µs, scn, rs_id, ssn) —
  *    the typed projection of the wire's union-array sort_keys
  *    (":261-295"), totally ordering events per row
  */
object Decode {

  case class Options(
      dmlBlacklist: Set[String] = Set.empty,
      columns: Seq[String] = Nil,
      allowlist: TableAllowlist = TableAllowlist(Nil),
      includePosition: Boolean = false)

  /** Decode an envelope DataFrame (from [[DatastreamAvro]]) into the
    * engine's change-event shape. */
  def changeEvents(envelope0: DataFrame, opts: Options = Options()): DataFrame = {
    // allowlist BEFORE the payload projection: excluded tables' rows
    // are dropped on the two source_metadata identity fields alone and
    // their payload struct is never projected (the reference scopes
    // replication the same way, util/Utils.java:297-342)
    val envelope =
      if (opts.allowlist.allowsAll) envelope0
      else envelope0.filter(opts.allowlist.filter(
        col("source_metadata.schema"), col("source_metadata.table")))
    val payloadType = envelope.schema("payload").dataType.asInstanceOf[StructType]
    val projected: Column =
      if (opts.columns.isEmpty) col("payload")
      else struct(opts.columns.map(c => col(s"payload.$c")): _*)

    val isSnapshot =
      col(DatastreamAvro.FilePathCol).contains("backfill") ||
        coalesce(col("read_method"), lit("")).contains("backfill")

    val rawOp = coalesce(col("source_metadata.change_type"),
      when(isSnapshot, lit("INSERT")))
    val op = when(rawOp === "UPDATE-DELETE", "DELETE")
      .when(rawOp === "UPDATE-INSERT", "UPDATE")
      .otherwise(rawOp)

    // per-record position bookkeeping (the reference's per-file resume
    // `position`, DatastreamEventConsumer.java:73/:355):
    // (_file_path, source_row) totally orders the stream's records;
    // null where the envelope format cannot supply it (JSON twin)
    val positionCols: Seq[Column] =
      if (!opts.includePosition) Nil
      else if (envelope.schema.fieldNames.contains(DatastreamAvro.FileRowCol))
        Seq(col(DatastreamAvro.FileRowCol).as("source_row"))
      else Seq(lit(null).cast("long").as("source_row"))

    val decoded = envelope.select(Seq(
      col("source_metadata.database").as("database"),
      col("source_metadata.schema").as("schema_name"),
      col("source_metadata.table").as("table_name"),
      op.as("op"),
      isSnapshot.as("is_snapshot"),
      projected.as("row"),
      col("source_metadata.row_id").as("row_id"),
      col("source_metadata.tx_id").as("tx_id"),
      col("source_timestamp"),
      struct(
        unix_millis(col("source_timestamp")).as("ts_ms"),
        coalesce(col("source_metadata.scn"), lit(0L)).as("scn"),
        coalesce(col("source_metadata.rs_id"), lit("")).as("rs_id"),
        coalesce(col("source_metadata.ssn"), lit(0L)).as("ssn")).as("sort_key"),
      // filename-embedded metadata (reference parses both from paths:
      // schema_key = first "_" token of the filename,
      // DatastreamEventReader.java:647-650; source time = the
      // yyyy/MM/dd/HH/mm folder path, ":676-678")
      coalesce(col("schema_key"),
        regexp_extract(col(DatastreamAvro.FilePathCol),
          "([^/_]+)_[^/]*$", 1)).as("schema_key"),
      regexp_extract(col(DatastreamAvro.FilePathCol),
        "(\\d{4}/\\d{2}/\\d{2}/\\d{2}/\\d{2})", 1).as("source_time_path"),
      col(DatastreamAvro.FilePathCol)) ++ positionCols: _*)
      // previous_row := row for UPDATE (PK unchanged by construction:
      // PK updates arrive as a DELETE+UPDATE pair)
      .withColumn("previous_row", when(col("op") === "UPDATE", col("row")))

    if (opts.dmlBlacklist.isEmpty) decoded
    else decoded.filter(!col("op").isin(opts.dmlBlacklist.toSeq: _*))
  }

  /** Convenience: read + decode a directory/glob of Datastream avro
    * files in one call. */
  def fromAvro(spark: org.apache.spark.sql.SparkSession, glob: String,
      opts: Options = Options()): DataFrame =
    changeEvents(DatastreamAvro.read(spark, glob), opts)
}
