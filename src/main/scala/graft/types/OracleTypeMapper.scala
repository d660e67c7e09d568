package graft.types

import org.apache.spark.sql.types._

/** One source column as discovered from the catalog. */
case class ColumnSpec(
    name: String,
    typeString: String,
    nullable: Boolean = true)

/** Per-column verdict of the standardization pass. */
case class ColumnAssessment(
    name: String,
    oracleType: OracleDataType,
    supported: Boolean,
    sparkType: Option[DataType],
    suggestion: Option[String])

/** A source table after standardization: unsupported columns dropped
  * (but reported), supported ones mapped to Spark types. */
case class StandardizedTable(
    database: String,
    schema: String,
    table: String,
    primaryKeys: Seq[String],
    sparkSchema: StructType,
    assessments: Seq[ColumnAssessment])

/** Oracle → Spark type standardization, reproducing the reference's
  * canonical mapping (DatastreamTableAssessor.java:84-168) on Spark's
  * type system — including the NUMBER precision/scale lattice:
  *
  *  - NUMBER (no precision)            → StringType (lossless)
  *  - NUMBER(p[,s<=0]) with p<=18      → LongType
  *  - NUMBER(*|p>18[,s<=0])            → StringType
  *  - NUMBER(p,s>0)                    → DecimalType(p,s)
  *  - NUMBER(*,s>0)                    → DecimalType(38,s)
  *
  * TIMESTAMP WITH TIME ZONE keeps the reference's two-field struct
  * encoding (timestampTz TIMESTAMP_MICROS + offset TIMESTAMP_MILLIS,
  * DatastreamTableAssessor.java:152-154) — both TimestampType here.
  * Oracle DECIMAL is treated as an alias of NUMBER (same lattice); the
  * reference parses p/s directly and cannot represent DECIMAL(*).
  */
object OracleTypeMapper {

  import OracleDataType._

  val timestampTzStruct: StructType = StructType(Seq(
    StructField("timestampTz", TimestampType),
    StructField("offset", TimestampType)))

  /** Map one Oracle type (+ optional precision/scale, where precision
    * may be "*") to a Spark type; None = unsupported column. */
  def toSparkType(
      dt: OracleDataType,
      precision: Option[String] = None,
      scale: Option[String] = None): Option[DataType] = dt match {
    case Bfile | Char | Nchar | Nvarchar2 | Rowid | Varchar | Varchar2 =>
      Some(StringType)
    case Real | BinaryFloat => Some(FloatType)
    case BinaryDouble | DoublePrecision | Float => Some(DoubleType)
    case Raw => Some(BinaryType)
    case Date | Timestamp => Some(TimestampType)
    case Integer | Smallint => Some(IntegerType)
    case Number | Decimal => Some(numberLattice(precision, scale))
    case TimestampWithTimeZone => Some(timestampTzStruct)
    case _ => None
  }

  private def numberLattice(
      precision: Option[String], scale: Option[String]): DataType =
    precision match {
      case None => StringType
      case Some(p) =>
        val s = scale.map(_.toInt).getOrElse(0)
        if (s <= 0) {
          if (p == "*" || p.toInt > 18) StringType else LongType
        } else if (p == "*") DecimalType(38, s)
        // Oracle allows scale > precision (NUMBER(2,5)); Spark doesn't —
        // widen precision to the scale, which is lossless.
        else DecimalType(math.max(p.toInt, s), s)
    }

  /** Evaluate one column: parse its type string, map it, and produce
    * the assessment (mirrors evaluateColumn's field+assessment pair). */
  def evaluate(spec: ColumnSpec): ColumnAssessment = {
    val (dt, p, s) = OracleDataType.parseWithParams(spec.typeString)
    val sparkType = toSparkType(dt, p, s)
    ColumnAssessment(
      name = spec.name,
      oracleType = dt,
      supported = sparkType.isDefined,
      sparkType = sparkType,
      suggestion = if (sparkType.isDefined) None
        else Some(s"Unsupported Oracle Data Type: ${dt.sqlName}"))
  }

  /** Standardize a whole table: evaluate every column, drop the
    * unsupported ones from the Spark schema, keep all assessments
    * (DatastreamTableRegistry.java:174-186 policy). */
  def standardize(
      database: String,
      schema: String,
      table: String,
      columns: Seq[ColumnSpec],
      primaryKeys: Seq[String] = Nil): StandardizedTable = {
    val evals = columns.map(evaluate)
    val fields = columns.zip(evals).collect {
      case (spec, a) if a.supported =>
        StructField(spec.name, a.sparkType.get, spec.nullable)
    }
    StandardizedTable(database, schema, table, primaryKeys,
      StructType(fields), evals)
  }
}
