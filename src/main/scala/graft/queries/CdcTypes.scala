package graft.queries

import org.apache.avro.{Schema => AvroSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.{AvroSchemaConverter, ColumnSpec, OracleTypeMapper}

/** Type-standardization surface as queries: the Oracle→Spark mapping
  * over the reference's wide-datatype e2e table (FIXTURES.md §3, plus
  * NUMBER-lattice edge rows) and the Avro→Spark conversion matrix
  * (FIXTURES.md §4). Oracles are literal VALUES derived from the
  * documented matrices — independent of this implementation.
  */
object CdcTypes {

  /** The e2e wide-datatype DDL (pluginParameters.properties:22-28) +
    * extra rows exercising every branch of the NUMBER lattice and the
    * unsupported set. */
  val wideDdl: Seq[(String, String)] = Seq(
    "ID" -> "VARCHAR2(100)", "COL1" -> "CHAR", "COL2" -> "CHAR(10)",
    "COL3" -> "VARCHAR(3)", "COL4" -> "VARCHAR2(3)", "COL5" -> "NCHAR(2)",
    "COL6" -> "NCHAR(30)", "COL7" -> "NVARCHAR2(30)", "COL11" -> "ROWID",
    "COL12" -> "NUMBER(4)", "COL13" -> "NUMBER(*)", "COL15" -> "NUMBER(10,-3)",
    "COL16" -> "NUMBER", "COL17" -> "DECIMAL(4)", "COL18" -> "DECIMAL(*)",
    "COL20" -> "DECIMAL(10,-3)", "COL21" -> "DECIMAL", "COL22" -> "FLOAT",
    "COL24" -> "INTEGER", "COL25" -> "DOUBLE PRECISION", "COL26" -> "REAL",
    "COL27" -> "SMALLINT", "COL28" -> "TIMESTAMP", "COL29" -> "TIMESTAMP(9)",
    "COL33" -> "DATE", "COL35" -> "BFILE",
    // NUMBER lattice edges + unsupported types
    "X01" -> "NUMBER(18)", "X02" -> "NUMBER(19)", "X03" -> "NUMBER(10,2)",
    "X04" -> "NUMBER(*,5)", "X05" -> "NUMBER(38,38)",
    "X06" -> "TIMESTAMP(6) WITH TIME ZONE", "X07" -> "BINARY_DOUBLE",
    "X08" -> "BINARY FLOAT", "X09" -> "RAW(16)",
    "X10" -> "BLOB", "X11" -> "CLOB", "X12" -> "NCLOB", "X13" -> "LONG",
    "X14" -> "LONG RAW", "X15" -> "XMLTYPE", "X16" -> "ANYDATA",
    "X17" -> "UDT", "X18" -> "UROWID",
    "X19" -> "INTERVAL DAY TO SECOND", "X20" -> "INTERVAL YEAR TO MONTH",
    "X21" -> "SOMETHING ELSE")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Oracle type evaluation (NUMBER lattice etc.) ----
    "c03_oracle_type_map" -> { (s, _) =>
      import s.implicits._
      val rows = wideDdl.map { case (name, ts) =>
        val a = OracleTypeMapper.evaluate(ColumnSpec(name, ts))
        (name, a.oracleType.sqlName,
          a.sparkType.map(_.simpleString), a.supported)
      }
      rows.toDF("col_name", "oracle_type", "spark_type", "supported")
        .orderBy($"col_name")
    },

    // ---- Avro wire-type → Spark conversion matrix ----
    "c04_avro_type_map" -> { (s, _) =>
      import s.implicits._
      val schema = new AvroSchema.Parser().parse(avroMatrixJson)
      val st = AvroSchemaConverter.toStructType(schema)
      st.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString, f.nullable))
        .toDF("field", "spark_type", "nullable")
        .orderBy($"field")
    }
  )

  /** 21-field conversion-matrix record (FIXTURES.md §4). */
  val avroMatrixJson: String =
    """{"type":"record","name":"matrix","fields":[
      |{"name":"f01_int","type":"int"},
      |{"name":"f02_date","type":{"type":"int","logicalType":"date"}},
      |{"name":"f03_time_millis","type":{"type":"int","logicalType":"time-millis"}},
      |{"name":"f04_long","type":"long"},
      |{"name":"f05_time_micros","type":{"type":"long","logicalType":"time-micros"}},
      |{"name":"f06_ts_millis","type":{"type":"long","logicalType":"timestamp-millis"}},
      |{"name":"f07_ts_micros","type":{"type":"long","logicalType":"timestamp-micros"}},
      |{"name":"f08_local_ts_millis","type":{"type":"long","logicalType":"local-timestamp-millis"}},
      |{"name":"f09_local_ts_micros","type":{"type":"long","logicalType":"local-timestamp-micros"}},
      |{"name":"f10_null","type":"null"},
      |{"name":"f11_float","type":"float"},
      |{"name":"f12_double","type":"double"},
      |{"name":"f13_bytes","type":"bytes"},
      |{"name":"f14_fixed","type":{"type":"fixed","name":"fx","size":4}},
      |{"name":"f15_decimal","type":{"type":"bytes","logicalType":"decimal","precision":5,"scale":3}},
      |{"name":"f16_string","type":"string"},
      |{"name":"f17_boolean","type":"boolean"},
      |{"name":"f18_map","type":{"type":"map","values":"string"}},
      |{"name":"f19_enum","type":{"type":"enum","name":"en","symbols":["A","B"]}},
      |{"name":"f20_array","type":{"type":"array","items":"int"}},
      |{"name":"f21_union","type":["int","string"]}
      |]}""".stripMargin

  private def values(rows: Seq[String], cols: String) =
    s"SELECT * FROM (VALUES ${rows.mkString(",\n")}) AS t($cols)"

  val oracle: Map[String, String] = Map(
    "c03_oracle_type_map" -> (values(Seq(
      "('ID','VARCHAR2','string',true)", "('COL1','CHAR','string',true)",
      "('COL2','CHAR','string',true)", "('COL3','VARCHAR','string',true)",
      "('COL4','VARCHAR2','string',true)", "('COL5','NCHAR','string',true)",
      "('COL6','NCHAR','string',true)", "('COL7','NVARCHAR2','string',true)",
      "('COL11','ROWID','string',true)", "('COL12','NUMBER','bigint',true)",
      "('COL13','NUMBER','string',true)", "('COL15','NUMBER','bigint',true)",
      "('COL16','NUMBER','string',true)", "('COL17','DECIMAL','bigint',true)",
      "('COL18','DECIMAL','string',true)", "('COL20','DECIMAL','bigint',true)",
      "('COL21','DECIMAL','string',true)", "('COL22','FLOAT','double',true)",
      "('COL24','INTEGER','int',true)", "('COL25','DOUBLE_PRECISION','double',true)",
      "('COL26','REAL','float',true)", "('COL27','SMALLINT','int',true)",
      "('COL28','TIMESTAMP','timestamp',true)", "('COL29','TIMESTAMP','timestamp',true)",
      "('COL33','DATE','timestamp',true)", "('COL35','BFILE','string',true)",
      "('X01','NUMBER','bigint',true)", "('X02','NUMBER','string',true)",
      "('X03','NUMBER','decimal(10,2)',true)", "('X04','NUMBER','decimal(38,5)',true)",
      "('X05','NUMBER','decimal(38,38)',true)",
      "('X06','TIMESTAMP_WITH_TIME_ZONE','struct<timestampTz:timestamp,offset:timestamp>',true)",
      "('X07','BINARY_DOUBLE','double',true)", "('X08','BINARY_FLOAT','float',true)",
      "('X09','RAW','binary',true)",
      "('X10','BLOB',NULL,false)", "('X11','CLOB',NULL,false)",
      "('X12','NCLOB',NULL,false)", "('X13','LONG',NULL,false)",
      "('X14','LONG_RAW',NULL,false)", "('X15','XMLTYPE',NULL,false)",
      "('X16','ANYDATA',NULL,false)", "('X17','UDT',NULL,false)",
      "('X18','UROWID',NULL,false)",
      "('X19','INTERVAL_DAY_TO_SECOND',NULL,false)",
      "('X20','INTERVAL_YEAR_TO_MONTH',NULL,false)",
      "('X21','OTHER',NULL,false)"),
      "col_name, oracle_type, spark_type, supported") + " ORDER BY col_name"),

    "c04_avro_type_map" -> (values(Seq(
      "('f01_int','int',false)", "('f02_date','date',false)",
      "('f03_time_millis','int',false)", "('f04_long','bigint',false)",
      "('f05_time_micros','bigint',false)", "('f06_ts_millis','timestamp',false)",
      "('f07_ts_micros','timestamp',false)", "('f08_local_ts_millis','timestamp',false)",
      "('f09_local_ts_micros','timestamp',false)", "('f10_null','void',true)",
      "('f11_float','float',false)", "('f12_double','double',false)",
      "('f13_bytes','binary',false)", "('f14_fixed','binary',false)",
      "('f15_decimal','decimal(5,3)',false)", "('f16_string','string',false)",
      "('f17_boolean','boolean',false)", "('f18_map','map<string,string>',false)",
      "('f19_enum','string',false)", "('f20_array','array<int>',false)",
      "('f21_union','string',false)"),
      "field, spark_type, nullable") + " ORDER BY field")
  )
}
