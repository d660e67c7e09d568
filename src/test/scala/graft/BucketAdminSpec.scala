package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BucketAdmin, LocalDirBucketAdmin, ProcessedFiles}

/** Bucket provisioning lifecycle (reference util/Utils.java:855-899):
  * single-winner creation under a multi-worker race, the recorded
  * 30-day purge policy, conflict-swallow semantics, delete, and the
  * composition with ProcessedFiles — the policy the bucket records is
  * the rule the stamp+sweep pair executes. */
class BucketAdminSpec extends AnyFunSuite {

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(Paths.get("target"), tag).toString

  test("createIfNotExisting: exactly one winner under a 16-worker " +
      "race; losers read false, never an error") {
    val admin = new LocalDirBucketAdmin(freshRoot("bk-race"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val results = (0 until 16).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = {
            gate.await()
            admin.createIfNotExisting("dump-bucket", "us-central1")
          }
        })
      }
      gate.countDown()
      val created = results.map(_.get()).count(identity)
      assert(created == 1, s"$created workers claimed creation")
      assert(admin.exists("dump-bucket"))
      // the winner's policy is intact (no loser half-wrote it)
      assert(admin.policy("dump-bucket")
        .contains(("us-central1", BucketAdmin.PurgeTtlDays)))
    } finally pool.shutdown()
  }

  test("policy records the reference's 30-day purge TTL by default; " +
      "delete removes the bucket and re-create wins again") {
    val admin = new LocalDirBucketAdmin(freshRoot("bk-life"))
    assert(admin.createIfNotExisting("b1"))
    assert(admin.policy("b1").exists(_._2 == 30))
    assert(!admin.createIfNotExisting("b1")) // conflict -> false
    admin.delete("b1")
    assert(!admin.exists("b1"))
    admin.delete("b1") // idempotent
    assert(admin.createIfNotExisting("b1", "eu", ttlDays = 7))
    assert(admin.policy("b1").contains(("eu", 7)))
    intercept[IllegalArgumentException](
      admin.createIfNotExisting("b2", ttlDays = 0))
  }

  test("the recorded policy drives ProcessedFiles' sweep — the two " +
      "halves of the GCS lifecycle story compose") {
    val root = freshRoot("bk-sweep")
    val admin = new LocalDirBucketAdmin(root)
    assert(admin.createIfNotExisting("cdc-bucket"))
    val (_, ttlDays) = admin.policy("cdc-bucket").get
    val bucket = Paths.get(root).resolve("cdc-bucket")
    val log = bucket.resolve("_processed.log").toString
    // two blobs: one stamped ttl+1 days ago, one stamped now
    val oldBlob = bucket.resolve("2026/01/old.avro")
    val newBlob = bucket.resolve("2026/08/new.avro")
    Files.createDirectories(oldBlob.getParent)
    Files.createDirectories(newBlob.getParent)
    Files.write(oldBlob, "x".getBytes); Files.write(newBlob, "y".getBytes)
    val now = 1700000000000L
    val day = 86400000L
    ProcessedFiles.record(log, Seq(oldBlob.toString),
      now - (ttlDays + 1) * day)
    ProcessedFiles.record(log, Seq(newBlob.toString), now - day)
    val purged = ProcessedFiles.sweep(log, ttlDays * day, now)
    assert(purged == Seq(oldBlob.toString))
    assert(!Files.exists(oldBlob) && Files.exists(newBlob))
  }
  test("withRetries retries transient weather, aborts misconfig on " +
      "the first attempt, and never hammers a create conflict") {
    import graft.util.Retry
    var deleteCalls = 0
    var createCalls = 0
    val flaky = new BucketAdmin {
      val inner = new LocalDirBucketAdmin(freshRoot("bk-retry"))
      override def createIfNotExisting(n: String, l: String,
          t: Int): Boolean = {
        createCalls += 1
        inner.createIfNotExisting(n, l, t)
      }
      override def delete(n: String): Unit = {
        deleteCalls += 1
        if (deleteCalls < 3)
          throw new java.io.IOException("transient storage fault")
        inner.delete(n)
      }
      override def exists(n: String): Boolean = inner.exists(n)
      override def policy(n: String): Option[(String, Int)] = inner.policy(n)
    }
    val admin = BucketAdmin.withRetries(flaky, sleep = _ => ())
    assert(admin.createIfNotExisting("b1"))
    admin.delete("b1") // two faults, then success
    assert(deleteCalls == 3 && !admin.exists("b1"))
    // a racing create is a CONFLICT resolved to false INSIDE the
    // implementation, not an exception: one attempt, no hammering
    assert(admin.createIfNotExisting("b2"))
    createCalls = 0
    assert(!admin.createIfNotExisting("b2"))
    assert(createCalls == 1)
    // misconfiguration (bad TTL -> IllegalArgumentException) is an
    // abort code: first attempt fails the pipeline, no retry
    createCalls = 0
    intercept[Retry.FatalPipelineException](
      admin.createIfNotExisting("b3", ttlDays = -1))
    assert(createCalls == 1)
  }
}
