package graft.types

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.spark.sql.types._

/** Avro → Spark schema conversion for the Datastream event envelope,
  * reproducing the reference's wire-type matrix
  * (DatastreamEventConsumer.java:114-180):
  *
  *  - logical date → DateType; time-millis → IntegerType;
  *    time-micros → LongType (Spark has no TIME type)
  *  - timestamp-millis/micros AND local-timestamp-millis/micros all
  *    collapse to TimestampType (the reference collapses local-* the
  *    same way, DatastreamEventConsumer.java:145-151)
  *  - bytes/fixed with decimal(p,s) → DecimalType(p,s), else BinaryType
  *  - Datastream's custom string logical types varchar(n)/number are
  *    plain strings (doc comment DatastreamEventConsumer.java:114-118)
  *  - enum → StringType; map → MapType(string, V)
  *  - union: [null, T] (either order) → nullable T; any other union →
  *    StringType fallback (the envelope's sort_keys items are
  *    ["string","long"] and are consumed as strings)
  */
object AvroSchemaConverter {

  def toStructType(schema: AvroSchema): StructType =
    toSparkType(schema)._1 match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"top-level Avro schema must be a record, got $other")
    }

  /** Returns (sparkType, nullable). */
  def toSparkType(schema: AvroSchema): (DataType, Boolean) = {
    import AvroSchema.Type._
    schema.getType match {
      case RECORD =>
        val fields = schema.getFields.asScala.map { f =>
          val (dt, nullable) = toSparkType(f.schema())
          StructField(f.name(), dt, nullable)
        }
        (StructType(fields.toSeq), false)

      case INT => schema.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false) // incl. time-millis
      }

      case LONG => schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros |
             _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
          (TimestampType, false)
        case _ => (LongType, false) // incl. time-micros
      }

      case FLOAT => (FloatType, false)
      case DOUBLE => (DoubleType, false)
      case BOOLEAN => (BooleanType, false)
      case STRING => (StringType, false) // incl. varchar(n)/number customs
      case ENUM => (StringType, false)
      case NULL => (NullType, true)

      case BYTES | FIXED => schema.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }

      case MAP =>
        val (vt, vNullable) = toSparkType(schema.getValueType)
        (MapType(StringType, vt, vNullable), false)

      case ARRAY =>
        val (et, eNullable) = toSparkType(schema.getElementType)
        (ArrayType(et, eNullable), false)

      case UNION =>
        val branches = schema.getTypes.asScala.toSeq
        val nonNull = branches.filter(_.getType != NULL)
        if (nonNull.size == 1) {
          val (dt, _) = toSparkType(nonNull.head)
          (dt, branches.size > nonNull.size)
        } else {
          // heterogeneous union (e.g. sort_keys' [string,long]):
          // string fallback, nullable iff a null branch exists
          (StringType, branches.size > nonNull.size)
        }

      case other =>
        throw new IllegalArgumentException(s"unsupported Avro type $other")
    }
  }
}
