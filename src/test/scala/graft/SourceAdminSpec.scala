package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcTable
import graft.sources.DatastreamAvro
import graft.streaming.{CdcStream, LocalDirSourceAdmin, SourceAdmin}
import graft.util.Retry

/** Control-plane lifecycle (SURVEY §2.1's promised thin adapter over
  * the reference's stream CRUD, util/Utils.java:548-561): state
  * machine, retry taxonomy on waits, and a pause/resume cycle driving
  * a real checkpointed pipeline exactly-once. */
class SourceAdminSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/src/test/resources"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("state machine: create -> start -> pause -> resume -> delete") {
    val admin = new LocalDirSourceAdmin(
      Files.createTempDirectory(Paths.get("target"), "admin").toString)
    admin.create("s1", "/tmp/in/*.avro")
    assert(admin.state("s1") == SourceAdmin.Created)
    assert(admin.sourceGlob("s1") == "/tmp/in/*.avro")
    admin.start("s1")
    assert(admin.state("s1") == SourceAdmin.Running)
    // illegal transitions are fatal (config error, not retryable)
    intercept[Retry.FatalPipelineException](admin.start("s1"))
    intercept[Retry.FatalPipelineException](admin.resume("s1"))
    admin.pause("s1")
    assert(admin.state("s1") == SourceAdmin.Paused)
    intercept[Retry.FatalPipelineException](admin.pause("s1"))
    admin.resume("s1")
    assert(admin.state("s1") == SourceAdmin.Running)
    admin.delete("s1")
    assert(!admin.exists("s1"))
    intercept[Retry.FatalPipelineException](admin.state("s1"))
    admin.create("s1", "y") // id reusable after delete
    assert(admin.state("s1") == SourceAdmin.Created)
  }

  test("awaitState retries transient mismatch with backoff, then succeeds") {
    val admin = new LocalDirSourceAdmin(
      Files.createTempDirectory(Paths.get("target"), "admin-wait").toString)
    admin.create("s2", "/tmp/in/*.avro")
    var slept = 0
    // flip the stream to RUNNING from "another worker" after two polls
    val s = admin.awaitState("s2", SourceAdmin.Running, sleep = { _ =>
      slept += 1
      if (slept == 2) admin.start("s2")
    })
    assert(s == SourceAdmin.Running && slept >= 2)
  }

  test("managed pipeline: pause stops intake, resume picks up new files exactly-once") {
    val root = Files.createTempDirectory(Paths.get("target"), "admin-pipe")
    val src = root.resolve("in"); Files.createDirectories(src)
    Files.copy(Paths.get(s"$fixtures/dump.avro"),
      src.resolve("s1_oracle-backfill_0_0.avro"))
    val admin = new LocalDirSourceAdmin(root.resolve("admin").toString)
    val schema = DatastreamAvro.sparkSchema(s"$fixtures/dump.avro")
    val table = new CdcTable(spark, root.resolve("table").toString,
      Seq("EMPLOYEE_ID"))
    val ckpt = root.resolve("ckpt").toString

    val p1 = CdcStream.startManaged(spark, admin, "pipe", s"$src/*.avro",
      schema, table, ckpt)
    p1.query.processAllAvailable()
    CdcStream.pauseManaged(p1, admin, "pipe")
    assert(admin.state("pipe") == SourceAdmin.Paused)
    assert(table.state.get.count() == 108)

    // file lands while paused; resume drains it from the same checkpoint
    Files.copy(Paths.get(s"$fixtures/insert.avro"),
      src.resolve("s1_oracle-cdc-logminer_0_1.avro"))
    val p2 = CdcStream.startManaged(spark, admin, "pipe", s"$src/*.avro",
      schema, table, ckpt)
    CdcStream.drain(p2)
    assert(admin.state("pipe") == SourceAdmin.Running)
    assert(table.state.get.count() == 109) // dump replayed 0 times, insert once
  }
}
