package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WorkerLease

/** Multi-worker coordination (SURVEY §2.10): the TTL-lease election
  * with fencing tokens that replaces the reference's no-failover
  * created-flag election (DatastreamDeltaSource.java:159-160 →
  * DatastreamEventReader.java:171-173). local[32] cannot host real
  * multi-JVM workers, but the lease's atomicity contract is
  * create-if-absent on shared storage — which races identically from
  * threads, so THIS is the seam's real concurrency test. */
class WorkerLeaseSpec extends AnyFunSuite {

  private def freshDir(): String = {
    val d = Files.createTempDirectory("lease").toString
    d
  }

  test("acquire → renew → release lifecycle with monotone fences") {
    val lease = new WorkerLease(freshDir(), ttlMs = 60000)
    val f1 = lease.tryAcquire("w1")
    assert(f1.contains(1L))
    assert(lease.holder().exists(l => l.owner == "w1" && l.fence == 1L))
    assert(lease.renew("w1", 1L))
    // a rival cannot claim while w1 is live
    assert(lease.tryAcquire("w2").isEmpty)
    // release hands over immediately, with a HIGHER fence
    assert(lease.release("w1", 1L))
    val f2 = lease.tryAcquire("w2")
    assert(f2.contains(2L))
    // the released holder's old fence is dead authority
    assert(!lease.renew("w1", 1L))
  }

  test("re-acquire by the current owner is an in-place renewal") {
    val lease = new WorkerLease(freshDir(), ttlMs = 60000)
    assert(lease.tryAcquire("w1").contains(1L))
    assert(lease.tryAcquire("w1").contains(1L)) // same fence, extended
    assert(lease.holder().exists(_.fence == 1L))
  }

  test("N threads race for an empty lease: exactly one wins") {
    val dir = freshDir()
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Option[Long]] {
        def call(): Option[Long] = {
          // every thread gets its OWN client (no shared state in the
          // class could serialize them accidentally)
          val l = new WorkerLease(dir, ttlMs = 60000)
          start.await()
          l.tryAcquire(s"w$i")
        }
      })
    }
    start.countDown()
    val won = results.map(_.get(30, TimeUnit.SECONDS)).count(_.isDefined)
    pool.shutdown()
    assert(won == 1, s"expected exactly one winner, got $won")
  }

  test("expiry fails over to a new worker; stale renew is fenced off") {
    var now = 1000L
    val dir = freshDir()
    val lease = new WorkerLease(dir, ttlMs = 100, clock = () => now)
    assert(lease.tryAcquire("w1").contains(1L))
    // within TTL the holder is safe
    now += 50
    assert(lease.tryAcquire("w2").isEmpty)
    // w1 goes silent; TTL passes; w2 takes over at fence 2
    now += 200
    assert(lease.tryAcquire("w2").contains(2L))
    // the revived w1 is deterministically fenced: old token rejected
    assert(!lease.renew("w1", 1L))
    assert(lease.tryAcquire("w1").isEmpty) // w2 is live now
    assert(lease.holder().exists(l => l.owner == "w2" && l.fence == 2L))
  }

  test("uncontested expiry revives on renew (no authority transferred)") {
    var now = 1000L
    val lease = new WorkerLease(freshDir(), ttlMs = 100, clock = () => now)
    assert(lease.tryAcquire("w1").contains(1L))
    now += 500 // expired, but nobody claimed
    assert(lease.renew("w1", 1L))
    assert(lease.tryAcquire("w2").isEmpty) // renewed back to life
  }

  test("claimer that crashed before writing content ages out by mtime") {
    val dir = freshDir()
    val lease = new WorkerLease(dir, ttlMs = 100)
    // simulate the crash window: claim file exists, content never came
    val p = Paths.get(dir, f"lease-${1L}%016d")
    Files.createDirectories(Paths.get(dir))
    Files.createFile(p)
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    // held-by-unknown is expired by now → takeover at fence 2
    assert(lease.holder().exists(l => l.owner == "" && l.fence == 1L))
    assert(lease.tryAcquire("w2").contains(2L))
  }

  test("old generations are pruned; the current claim survives") {
    var now = 1000L
    val dir = freshDir()
    val lease = new WorkerLease(dir, ttlMs = 10, clock = () => now)
    for (i <- 1 to 8) {
      val w = s"w${i % 2}"
      assert(lease.tryAcquire(w).isDefined, s"round $i")
      now += 100 // let it expire so the other worker claims next
    }
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lease-")).toSeq
    assert(files.size <= 5, s"prune left $files")
    assert(lease.holder().exists(_.fence == 8L))
  }

  test("runIfHolder gates work to exactly one live worker, with failover") {
    var now = 1000L
    val dir = freshDir()
    val a = new WorkerLease(dir, ttlMs = 100, clock = () => now)
    val b = new WorkerLease(dir, ttlMs = 100, clock = () => now)
    var ran = Vector.empty[String]
    // both workers tick; only one does maintenance per cycle
    def tick(): Unit = {
      a.runIfHolder("wa") { ran :+= "wa" }
      b.runIfHolder("wb") { ran :+= "wb" }
    }
    tick(); now += 50; tick()
    assert(ran == Vector("wa", "wa")) // first claimer keeps the duty
    // wa dies: stop calling its side, move past TTL — wb takes over
    now += 500
    b.runIfHolder("wb") { ran :+= "wb" }
    now += 50
    b.runIfHolder("wb") { ran :+= "wb" }
    assert(ran == Vector("wa", "wa", "wb", "wb"))
  }
}
