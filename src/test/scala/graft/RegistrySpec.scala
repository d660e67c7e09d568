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

  test("preflight maps control-plane, source-path and target-permission " +
      "failures to coded problems with suggestion and impact") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory(Paths.get("target"), "preflight")
    val admin = new graft.streaming.LocalDirSourceAdmin(
      root.resolve("admin").toString)
    val target = root.resolve("table").toString

    // healthy pipeline: no problems
    val src = root.resolve("src")
    Files.createDirectories(src)
    admin.create("s1", s"$src/*.avro")
    val ok = PipelineValidator.preflight(admin, "s1", target)
    assert(ok.ok, ok.problems.mkString("; "))

    // unreachable control plane (unknown stream) → connectivity issue,
    // the ORACLE_VALIDATE_CONNECTIVITY analog
    val noStream = PipelineValidator.preflight(admin, "nope", target)
    assert(noStream.connectivityIssues
      .exists(_.code == "CONTROL_PLANE_CONNECTIVITY"))
    assert(noStream.problems.forall(p =>
      p.suggestion.nonEmpty && p.impact.nonEmpty))

    // provisioned source path missing → connectivity issue, the
    // ORACLE_VALIDATE_TUNNEL_CONNECTIVITY analog
    admin.create("s2", s"$root/missing-dir/*.avro")
    val noPath = PipelineValidator.preflight(admin, "s2", target)
    assert(noPath.connectivityIssues
      .exists(_.code == "SOURCE_PATH_UNREACHABLE"))

    // unwritable target → permission problem (missingFeatures side),
    // the GCS_VALIDATE_PERMISSIONS analog. A plain file where the
    // directory should go blocks createDirectories for ANY uid (tests
    // run as root, which bypasses permission bits)
    val blocked = root.resolve("blocked")
    Files.write(blocked, "x".getBytes)
    val noWrite = PipelineValidator.preflight(admin, "s1", blocked.toString)
    assert(noWrite.missingFeatures
      .exists(_.code == "TARGET_WRITE_PERMISSIONS"))
    assert(noWrite.connectivityIssues.isEmpty)

    // a target nested UNDER the blocking file is just as unwritable —
    // the nearest existing ancestor is the file
    val nested = PipelineValidator.preflight(admin, "s1",
      blocked.resolve("sub/table").toString)
    assert(nested.missingFeatures
      .exists(_.code == "TARGET_WRITE_PERMISSIONS"))
  }

  test("preflight is read-only and treats ? and [ as glob metacharacters") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory(Paths.get("target"), "preflightro")
    val admin = new graft.streaming.LocalDirSourceAdmin(
      root.resolve("admin").toString)
    val src = root.resolve("src")
    Files.createDirectories(src)

    // '?' and '[' end the fixed prefix exactly like '*': the probe
    // must land on the existing $src, not on a literal "part-?" path
    admin.create("q", s"$src/part-?/*.avro")
    admin.create("b", s"$src/y=[0-9]*/*.avro")
    assert(PipelineValidator.preflight(admin, "q", src.toString).ok)
    assert(PipelineValidator.preflight(admin, "b", src.toString).ok)

    // validating must not MUTATE the environment under validation: a
    // missing target root is probed against its nearest existing
    // ancestor, never created as a side effect
    val absent = root.resolve("not-yet/created/table")
    val report = PipelineValidator.preflight(admin, "q", absent.toString)
    assert(report.ok, report.problems.mkString("; "))
    assert(!Files.exists(root.resolve("not-yet")),
      "preflight created the target root as a side effect")
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

  test("schema drift recurses into structs: add/drop/rename/type-change " +
      "at depth >= 2") {
    // the reference's Avro conversion is recursive
    // (DatastreamEventConsumer.java:97-180), so drift lands inside
    // nested records too
    def geo(fields: StructField*) = StructField("geo", StructType(fields))
    def props(fields: StructField*) =
      StructField("props", StructType(fields))
    val cc = StructField("cc", StringType)
    val cur = StructType(Seq(StructField("A", LongType),
      props(StructField("tier", StringType), geo(cc))))

    // nested ADD at depth 2: props.geo.region appears
    val region = StructField("region", StringType, nullable = false)
    val incAdd = StructType(Seq(StructField("A", LongType),
      props(StructField("tier", StringType), geo(cc, region))))
    val ch = SchemaDrift.diff(cur, incAdd).get
    assert(ch == Seq(SchemaDrift.AddColumn(region, Seq("props", "geo"))), ch)
    assert(ch.collect { case a: SchemaDrift.AddColumn =>
      SchemaDrift.qualifiedName(a) } == Seq("props.geo.region"))
    val widened = SchemaDrift.widen(cur, ch)
    val wGeo = widened("props").dataType.asInstanceOf[StructType]("geo")
      .dataType.asInstanceOf[StructType]
    assert(wGeo.fieldNames.toSeq == Seq("cc", "region"))
    assert(wGeo("region").nullable) // nested adds always nullable

    // nested DROP: geo loses cc — NOT drift (the column stays; the
    // merge null-fills it), same policy as a top-level drop
    val incDrop = StructType(Seq(StructField("A", LongType),
      props(StructField("tier", StringType), geo())))
    assert(SchemaDrift.diff(cur, incDrop).isEmpty)

    // nested RENAME = drop + add: cc -> country keeps cc, adds country
    val country = StructField("country", StringType)
    val incRen = StructType(Seq(StructField("A", LongType),
      props(StructField("tier", StringType), geo(country))))
    val chR = SchemaDrift.diff(cur, incRen).get
    assert(chR == Seq(SchemaDrift.AddColumn(country, Seq("props", "geo"))))
    val widenedR = SchemaDrift.widen(cur, chR)
    assert(widenedR("props").dataType.asInstanceOf[StructType]("geo")
      .dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("cc", "country"))

    // nested TYPE change at depth 2 → rejected with the full path
    val incBadNested = StructType(Seq(StructField("A", LongType),
      props(StructField("tier", StringType),
        geo(StructField("cc", LongType)))))
    val e = intercept[IllegalArgumentException] {
      SchemaDrift.widen(cur, SchemaDrift.diff(cur, incBadNested).get)
    }
    assert(e.getMessage.contains("props.geo.cc"), e.getMessage)

    // struct-vs-scalar at depth 1 is a type change, not a merge
    val incFlat = StructType(Seq(StructField("A", LongType),
      StructField("props", StringType)))
    assertThrows[IllegalArgumentException] {
      SchemaDrift.widen(cur, SchemaDrift.diff(cur, incFlat).get)
    }
  }
}
