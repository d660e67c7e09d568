package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.SchemaDrift
import graft.registry._
import graft.types.ColumnSpec

class RegistrySpec extends AnyFunSuite {

  private val hr = TableDetail(
    TableId("xe", "HR", "EMPLOYEES"),
    Seq(ColumnSpec("EMPLOYEE_ID", "NUMBER(6)", nullable = false),
      ColumnSpec("FIRST_NAME", "VARCHAR2(20)"),
      ColumnSpec("SALARY", "NUMBER(8,2)"),
      ColumnSpec("RESUME", "CLOB")),
    primaryKeys = Seq("EMPLOYEE_ID"))

  private val sysTable = TableDetail(
    TableId("xe", "SYS", "AUD$"), Seq(ColumnSpec("X", "NUMBER(4)")), Nil)

  private val noPk = TableDetail(
    TableId("xe", "HR", "LOGS"), Seq(ColumnSpec("MSG", "VARCHAR2(100)")), Nil)

  private val registry = new TableRegistry(
    new InMemoryCatalog(Seq(hr, sysTable, noPk)))

  test("system schemas are filtered from discovery") {
    val ids = registry.listTables()
    assert(ids.contains(hr.id) && !ids.exists(_.schema == "SYS"))
  }

  test("standardize drops unsupported columns and keeps PK") {
    val t = registry.standardize(hr)
    assert(t.sparkSchema.fieldNames.toSeq ==
      Seq("EMPLOYEE_ID", "FIRST_NAME", "SALARY"))
    assert(t.sparkSchema("EMPLOYEE_ID").dataType == LongType)
    assert(t.sparkSchema("SALARY").dataType == DecimalType(8, 2))
    assert(t.primaryKeys == Seq("EMPLOYEE_ID"))
    assert(t.assessments.exists(a => a.name == "RESUME" && !a.supported))
  }

  test("assessment reports missing tables and missing PKs") {
    val assessor = new TableAssessor(registry)
    val a = assessor.assess(Seq(hr.id, noPk.id,
      TableId("xe", "HR", "NOPE")))
    assert(a.tables.size == 2)
    assert(a.problems.exists(_.code == "TABLE_NOT_FOUND"))
    assert(a.problems.exists(p =>
      p.code == "NO_PRIMARY_KEY" && p.table == noPk.id))
  }

  test("schema drift: widen-only with type-change rejection") {
    val cur = StructType(Seq(
      StructField("A", LongType), StructField("B", StringType)))
    val incAdd = StructType(cur.fields :+ StructField("C", DoubleType, nullable = false))
    assert(SchemaDrift.diff(cur, cur).isEmpty)
    val changes = SchemaDrift.diff(cur, incAdd).get
    assert(changes == Seq(SchemaDrift.AddColumn(incAdd("C"))))
    val widened = SchemaDrift.widen(cur, changes)
    assert(widened("C").nullable) // added columns always nullable
    val incBad = StructType(Seq(StructField("A", StringType)))
    assertThrows[IllegalArgumentException] {
      SchemaDrift.widen(cur, SchemaDrift.diff(cur, incBad).get)
    }
  }
}
