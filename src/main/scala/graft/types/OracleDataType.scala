package graft.types

/** The 33 Oracle source types the reference engine standardizes
  * (reference: src/main/java/io/cdap/delta/datastream/OracleDataType.java:27-60).
  */
sealed abstract class OracleDataType(val sqlName: String) {
  override def toString: String = sqlName
}

object OracleDataType {
  case object Anydata extends OracleDataType("ANYDATA")
  case object Bfile extends OracleDataType("BFILE")
  case object BinaryDouble extends OracleDataType("BINARY_DOUBLE")
  case object BinaryFloat extends OracleDataType("BINARY_FLOAT")
  case object Blob extends OracleDataType("BLOB")
  case object Char extends OracleDataType("CHAR")
  case object Clob extends OracleDataType("CLOB")
  case object Date extends OracleDataType("DATE")
  case object Decimal extends OracleDataType("DECIMAL")
  case object DoublePrecision extends OracleDataType("DOUBLE_PRECISION")
  case object Float extends OracleDataType("FLOAT")
  case object Integer extends OracleDataType("INTEGER")
  case object IntervalDayToSecond extends OracleDataType("INTERVAL_DAY_TO_SECOND")
  case object IntervalYearToMonth extends OracleDataType("INTERVAL_YEAR_TO_MONTH")
  case object Long extends OracleDataType("LONG")
  case object LongRaw extends OracleDataType("LONG_RAW")
  case object Nchar extends OracleDataType("NCHAR")
  case object Nclob extends OracleDataType("NCLOB")
  case object Number extends OracleDataType("NUMBER")
  case object Nvarchar2 extends OracleDataType("NVARCHAR2")
  case object Other extends OracleDataType("OTHER")
  case object Raw extends OracleDataType("RAW")
  case object Real extends OracleDataType("REAL")
  case object Rowid extends OracleDataType("ROWID")
  case object Smallint extends OracleDataType("SMALLINT")
  case object Timestamp extends OracleDataType("TIMESTAMP")
  case object TimestampWithTimeZone extends OracleDataType("TIMESTAMP_WITH_TIME_ZONE")
  case object Udt extends OracleDataType("UDT")
  case object Urowid extends OracleDataType("UROWID")
  case object Varchar extends OracleDataType("VARCHAR")
  case object Varchar2 extends OracleDataType("VARCHAR2")
  case object Xmltype extends OracleDataType("XMLTYPE")

  val all: Seq[OracleDataType] = Seq(
    Anydata, Bfile, BinaryDouble, BinaryFloat, Blob, Char, Clob, Date,
    Decimal, DoublePrecision, Float, Integer, IntervalDayToSecond,
    IntervalYearToMonth, Long, LongRaw, Nchar, Nclob, Number, Nvarchar2,
    Other, Raw, Real, Rowid, Smallint, Timestamp, TimestampWithTimeZone,
    Udt, Urowid, Varchar, Varchar2, Xmltype)

  /** Parse an Oracle type string (e.g. "NUMBER(10,2)",
    * "TIMESTAMP(9) WITH TIME ZONE", "DOUBLE PRECISION") to the enum.
    *
    * Same matching semantics as the reference
    * (util/Utils.java:136-209): prefix match for BINARY FLOAT /
    * DECIMAL / FLOAT / NUMBER / TIMESTAMP (with a WITH TIME ZONE
    * suffix check), exact match for the rest, OTHER as the fallback —
    * except that we strip a trailing "(...)" parameter list before the
    * exact match, so parameterized CHAR(10)/VARCHAR2(3)/RAW(16) still
    * resolve (the reference's registry receives them bare).
    */
  def parse(raw: String): OracleDataType = {
    val s = raw.trim.toUpperCase
    if (s.startsWith("BINARY FLOAT") || s.startsWith("BINARY_FLOAT")) BinaryFloat
    else if (s.startsWith("DECIMAL")) Decimal
    else if (s.startsWith("FLOAT")) Float
    else if (s.startsWith("NUMBER")) Number
    else if (s.startsWith("TIMESTAMP")) {
      if (s.endsWith("WITH TIME ZONE")) TimestampWithTimeZone else Timestamp
    } else {
      val bare = s.replaceAll("\\s*\\(.*\\)\\s*$", "")
      bare match {
        case "ANYDATA" => Anydata
        case "BFILE" => Bfile
        case "BINARY DOUBLE" | "BINARY_DOUBLE" => BinaryDouble
        case "BLOB" => Blob
        case "CHAR" => Char
        case "CLOB" => Clob
        case "DATE" => Date
        case "DOUBLE PRECISION" | "DOUBLE_PRECISION" => DoublePrecision
        case "INTEGER" | "INT" => Integer
        case "INTERVAL DAY TO SECOND" => IntervalDayToSecond
        case "INTERVAL YEAR TO MONTH" => IntervalYearToMonth
        case "LONG" => Long
        case "LONG RAW" | "LONG_RAW" => LongRaw
        case "NCHAR" => Nchar
        case "NCLOB" => Nclob
        case "NVARCHAR2" => Nvarchar2
        case "RAW" => Raw
        case "REAL" => Real
        case "ROWID" => Rowid
        case "SMALLINT" => Smallint
        case "UDT" => Udt
        case "UROWID" => Urowid
        case "VARCHAR" => Varchar
        case "VARCHAR2" => Varchar2
        case "XMLTYPE" => Xmltype
        case _ => Other
      }
    }
  }

  /** Parse a type string into (type, precision, scale); precision may
    * be the literal "*" (NUMBER(*,s)), which is why both come back as
    * strings. "NUMBER" → (Number, None, None); "NUMBER(10,-3)" →
    * (Number, Some("10"), Some("-3")). */
  def parseWithParams(raw: String): (OracleDataType, Option[String], Option[String]) = {
    val t = parse(raw)
    val params = "\\(([^)]*)\\)".r.findFirstMatchIn(raw)
      .map(_.group(1).split(",").map(_.trim).toSeq)
      .getOrElse(Seq.empty)
    (t, params.headOption.filter(_.nonEmpty), params.lift(1).filter(_.nonEmpty))
  }
}
