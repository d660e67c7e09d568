package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines variant of the Datastream change-event envelope
  * (Datastream can emit either Avro or JSON files to the bucket; the
  * reference consumes Avro, this engine accepts both). The envelope
  * schema is declared explicitly — never inferred at runtime — per
  * the reference's fixed-schema policy; the same [[graft.cdc.Decode]]
  * pipeline applies downstream.
  *
  * Scale: plain `spark.read.json` with a declared schema — splittable,
  * predicate/projection-prunable, whole-stage codegen'd.
  */
object DatastreamJson {

  /** Strip the path/row-position columns from an envelope schema (the
    * path is re-derived from the actual input file here; a per-file
    * row index is an Avro-container notion the JSON reader cannot
    * supply — it stays null, see [[DatastreamAvro.FileRowCol]]). */
  private def dataSchema(envelope: StructType): StructType =
    StructType(envelope.fields.filterNot(f =>
      f.name == DatastreamAvro.FilePathCol ||
        f.name == DatastreamAvro.FileRowCol))

  def read(spark: SparkSession, glob: String,
      envelope: StructType): DataFrame =
    spark.read.schema(dataSchema(envelope)).json(glob)
      .withColumn(DatastreamAvro.FilePathCol, input_file_name())

  def readStream(spark: SparkSession, glob: String,
      envelope: StructType): DataFrame =
    spark.readStream.schema(dataSchema(envelope)).json(glob)
      .withColumn(DatastreamAvro.FilePathCol, input_file_name())
}
