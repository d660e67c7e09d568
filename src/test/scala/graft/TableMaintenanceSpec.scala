package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcTable, Decode}
import graft.streaming.CdcRouter

class TableMaintenanceSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/src/test/resources"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  test("compact coalesces buckets; vacuum removes unreferenced versions") {
    val t = new CdcTable(spark, tmp("maint"), Seq("EMPLOYEE_ID"), numBuckets = 4)
    t.applyBatch(Decode.fromAvro(spark, s"$fixtures/dump.avro"), 0L)
    t.applyBatch(Decode.fromAvro(spark, s"$fixtures/insert.avro"), 1L)
    val before = t.state.get.orderBy("EMPLOYEE_ID").collect().map(_.toString)

    val cv = t.compact(minFiles = 1) // force: AQE already writes 1 file/bucket
    assert(cv.contains(2L))
    val after = t.state.get.orderBy("EMPLOYEE_ID").collect().map(_.toString)
    assert(before.toSeq == after.toSeq) // compaction is content-neutral
    // every bucket is a single file: the default threshold finds
    // nothing to rewrite and commits no version (maintenance cost
    // tracks fragmentation, not table size)
    assert(t.compact().isEmpty)

    val removed = t.vacuum(keepVersions = 1)
    assert(removed.nonEmpty) // v0/v1 bucket dirs dropped
    // current version still fully readable after vacuum
    assert(t.state.get.count() == before.length)
  }

  test("age-based vacuum keeps versions inside the retention window") {
    val t = new CdcTable(spark, tmp("maint-age"), Seq("EMPLOYEE_ID"),
      numBuckets = 4)
    t.applyBatch(Decode.fromAvro(spark, s"$fixtures/dump.avro"), 0L)
    t.applyBatch(Decode.fromAvro(spark, s"$fixtures/insert.avro"), 1L)
    // everything is seconds old: a 30-day window removes nothing
    assert(t.vacuumOlderThan(30L * 86400 * 1000).isEmpty)
    // a zero-width window keeps only the current version's buckets
    val removed = t.vacuumOlderThan(-1000L)
    assert(removed.nonEmpty)
    assert(t.state.get.count() == 109) // current version intact
  }

  test("multiplexed stream routes events to per-table targets") {
    val root = tmp("router")
    val router = new CdcRouter(spark, root, _ => Seq("EMPLOYEE_ID"),
      numBuckets = 4)
    // synthesize a 2-table batch: the fixture events + a renamed copy
    val base = Decode.fromAvro(spark, s"$fixtures/{dump,insert}.avro")
    val tableA = base.withColumn("table_name", lit("EMPLOYEES"))
    val tableB = base.filter(col("op") === "INSERT")
      .withColumn("table_name", lit("EMPLOYEES_AUDIT"))
      .limit(5)
    router.applyBatch(tableA.unionByName(tableB), 0L)

    assert(router.knownTables == Seq("EMPLOYEES", "EMPLOYEES_AUDIT"))
    assert(router.table("EMPLOYEES").state.get.count() == 109)
    assert(router.table("EMPLOYEES_AUDIT").state.get.count() <= 5)
    assert(router.table("EMPLOYEES_AUDIT").ddlEvents.head
      .contains("CREATE_TABLE"))
  }
}
