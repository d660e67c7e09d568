package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcTable
import graft.sources.DatastreamAvro
import graft.streaming.CdcStream

/** End-to-end streaming CDC: fixture files dropped into a watched
  * directory, streamed through decode + merge with checkpointed
  * exactly-once, including a stop/restart with late-arriving files. */
class StreamingCdcSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/src/test/resources"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream drains snapshot+CDC files; restart picks up only new files") {
    val root = Files.createTempDirectory(Paths.get("target"), "cdc-stream")
    val src = root.resolve("in"); Files.createDirectories(src)
    val ckpt = root.resolve("ckpt").toString
    val tableDir = root.resolve("table").toString

    def drop(fixture: String, as: String): Unit =
      Files.copy(Paths.get(s"$fixtures/$fixture"), src.resolve(as),
        StandardCopyOption.REPLACE_EXISTING)

    // phase 1: snapshot + first CDC file (production-style names)
    drop("dump.avro", "s1_oracle-backfill_0_0.avro")
    drop("insert.avro", "s1_oracle-cdc-logminer_0_1.avro")

    val schema = DatastreamAvro.sparkSchema(s"$fixtures/dump.avro")
    val table = new CdcTable(spark, tableDir, Seq("EMPLOYEE_ID"))
    CdcStream.drain(CdcStream.start(
      spark, s"${src.toString}/*.avro", schema, table, ckpt))

    val ids1 = table.live.get.select("EMPLOYEE_ID")
      .collect().map(_.getLong(0)).toSet
    assert(ids1.contains(210L)) // insert applied
    assert(table.state.get.count() == 109)

    // phase 2: late files arrive; new stream instance, same checkpoint
    drop("update.avro", "s1_oracle-cdc-logminer_0_2.avro")
    drop("update-pk.avro", "s1_oracle-cdc-logminer_0_3.avro")
    drop("delete.avro", "s1_oracle-cdc-logminer_0_4.avro")
    CdcStream.drain(CdcStream.start(
      spark, s"${src.toString}/*.avro", schema, table, ckpt))

    val st = table.state.get.collect()
      .map(r => r.getAs[Long]("EMPLOYEE_ID") -> r).toMap
    assert(st(210L).getAs[Boolean]("_is_deleted"))
    assert(!st(211L).getAs[Boolean]("_is_deleted"))
    assert(st(211L).getAs[java.math.BigDecimal]("SALARY")
      .compareTo(new java.math.BigDecimal("12131.00")) == 0)
    // snapshot rows processed exactly once across restarts
    assert(table.state.get.count() == 110) // 108 dump + 210 + 211

    // phase 3: nothing new → no new version committed
    val v = table.currentVersion
    CdcStream.drain(CdcStream.start(
      spark, s"${src.toString}/*.avro", schema, table, ckpt))
    assert(table.currentVersion == v)
  }

  test("dump-first gating: refuses an incomplete backfill; the snapshot " +
      "commits atomically before any CDC batch; final state matches the " +
      "order-insensitive path") {
    val root = Files.createTempDirectory(Paths.get("target"), "dumpfirst")
    val src = root.resolve("in"); Files.createDirectories(src)
    def drop(fixture: String, as: String): Unit =
      Files.copy(Paths.get(s"$fixtures/$fixture"), src.resolve(as),
        StandardCopyOption.REPLACE_EXISTING)
    // dump AND CDC files are ALL present before anything starts — the
    // exact situation the reference's gating exists for
    drop("dump.avro", "s1_oracle-backfill_0_0.avro")
    drop("insert.avro", "s1_oracle-cdc-logminer_0_1.avro")
    drop("update.avro", "s1_oracle-cdc-logminer_0_2.avro")
    drop("delete.avro", "s1_oracle-cdc-logminer_0_3.avro")
    val glob = s"${src.toString}/*.avro"
    val schema = DatastreamAvro.sparkSchema(s"$fixtures/dump.avro")

    val gated = new CdcTable(spark,
      root.resolve("gated").toString, Seq("EMPLOYEE_ID"))
    // control-plane says backfill not COMPLETED → refuse, apply nothing
    intercept[IllegalArgumentException] {
      CdcStream.startDumpFirst(spark, glob, schema, gated,
        root.resolve("ckpt0").toString, backfillComplete = () => false)
    }
    assert(gated.currentVersion.isEmpty)

    val p = CdcStream.startDumpFirst(spark, glob, schema, gated,
      root.resolve("ckpt1").toString)
    // phase 1 committed synchronously before the stream started: the
    // FIRST version is exactly the 108 snapshot rows, no CDC leakage
    val dumpVersion = gated.currentVersion.get
    CdcStream.drain(p)
    val v1 = gated.stateAt(dumpVersion).get
    assert(v1.count() == 108)
    assert(!v1.select("EMPLOYEE_ID").collect().map(_.getLong(0)).contains(210L))

    // the phase-2 stream never re-decodes the snapshot blob, yet the
    // final state equals the default interleaved (order-insensitive) path
    val plain = new CdcTable(spark,
      root.resolve("plain").toString, Seq("EMPLOYEE_ID"))
    CdcStream.drain(CdcStream.start(spark, glob, schema, plain,
      root.resolve("ckpt2").toString))
    def snap(t: CdcTable) = t.state.get
      .select("EMPLOYEE_ID", "_is_deleted").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(snap(gated) == snap(plain))
  }

  test("processed-file TTL marking + age-gated purge (SetTTLTask analog): " +
      "only fully-processed files are reclaimed; the checkpoint keeps " +
      "exactly-once across the purge") {
    import graft.streaming.ProcessedFiles
    val root = Files.createTempDirectory(Paths.get("target"), "ttl-mark")
    val src = root.resolve("in"); Files.createDirectories(src)
    val ckpt = root.resolve("ckpt").toString
    val log = root.resolve("processed.log").toString
    def drop(fixture: String, as: String): Unit =
      Files.copy(Paths.get(s"$fixtures/$fixture"), src.resolve(as),
        StandardCopyOption.REPLACE_EXISTING)
    drop("dump.avro", "s1_oracle-backfill_0_0.avro")
    drop("insert.avro", "s1_oracle-cdc-logminer_0_1.avro")
    val glob = s"${src.toString}/*.avro"
    val schema = DatastreamAvro.sparkSchema(s"$fixtures/dump.avro")
    val table = new CdcTable(spark,
      root.resolve("table").toString, Seq("EMPLOYEE_ID"))
    CdcStream.drain(CdcStream.start(spark, glob, schema, table, ckpt,
      processedLog = Some(log)))

    def names(ps: Iterable[String]): Set[String] =
      ps.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    val now = System.currentTimeMillis()
    assert(names(ProcessedFiles.stamps(log).keys) ==
      Set("s1_oracle-backfill_0_0.avro", "s1_oracle-cdc-logminer_0_1.avro"))

    // TTL not reached → nothing reclaimed (the 30-day rule)
    assert(ProcessedFiles.sweep(log, ttlMs = 86400000L, nowMs = now).isEmpty)

    // a new, NOT-yet-processed file must survive any sweep
    drop("update.avro", "s1_oracle-cdc-logminer_0_2.avro")
    val deleted = ProcessedFiles.sweep(log, ttlMs = 0L,
      nowMs = System.currentTimeMillis())
    assert(names(deleted) ==
      Set("s1_oracle-backfill_0_0.avro", "s1_oracle-cdc-logminer_0_1.avro"))
    assert(names(Files.list(src).iterator().asScala.map(_.toString).toSeq) ==
      Set("s1_oracle-cdc-logminer_0_2.avro"))

    // restart over the purged directory: the checkpoint's exactly-once
    // is undisturbed — only the new file processes, then gets stamped
    CdcStream.drain(CdcStream.start(spark, glob, schema, table, ckpt,
      processedLog = Some(log)))
    assert(names(ProcessedFiles.stamps(log).keys)
      .contains("s1_oracle-cdc-logminer_0_2.avro"))
    // the purge cost no data and created no duplicates: 108 dump rows
    // + the one insert, with the update merged on top (same PK set)
    assert(table.state.get.count() == 109)
    assert(table.live.get.select("EMPLOYEE_ID").collect()
      .map(_.getLong(0)).toSet.contains(210L))
  }

  test("snapshot files are classified from production-style paths") {
    val root = Files.createTempDirectory(Paths.get("target"), "cdc-snap")
    Files.copy(Paths.get(s"$fixtures/insert.avro"),
      root.resolve("s1_oracle-backfill_0_0.avro"))
    val df = graft.cdc.Decode.fromAvro(spark, s"${root.toString}/*.avro")
    assert(df.collect().forall(_.getAs[Boolean]("is_snapshot")))
  }

  test("CdfFollow streams each commit's CDF exactly once, in version " +
      "order, and resumes from the checkpoint") {
    import graft.streaming.CdfFollow
    val dir = Files.createTempDirectory(Paths.get("target"), "cdf-follow")
      .toString
    val ckpt = Files.createTempDirectory(Paths.get("target"), "cdf-ckpt")
      .toString
    val table = new CdcTable(spark, dir, Seq("EMPLOYEE_ID"), numBuckets = 4)
    Seq("dump.avro", "insert.avro", "update.avro").zipWithIndex.foreach {
      case (f, i) =>
        table.applyBatch(graft.cdc.Decode.fromAvro(spark, s"$fixtures/$f"),
          i.toLong)
    }
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def drain(): Unit = {
      val q = CdfFollow.run(spark, table, ckpt, (v, cdf) =>
        seen.synchronized { seen += ((v, cdf.count())) })
      q.awaitTermination(60000); ()
    }
    drain()
    // versions 0..2, ascending, counts matching the direct reads
    assert(seen.map(_._1).toSeq == Seq(0L, 1L, 2L))
    seen.foreach { case (v, n) =>
      assert(n == table.changeFeedCdf(v).get.count(), s"v$v")
    }
    // two more commits; a resumed follow must deliver ONLY the new
    // versions (the file source's checkpointed log, not a rescan)
    Seq("update-pk.avro", "delete.avro").zipWithIndex.foreach {
      case (f, i) =>
        table.applyBatch(graft.cdc.Decode.fromAvro(spark, s"$fixtures/$f"),
          (3 + i).toLong)
    }
    seen.clear()
    drain()
    assert(seen.map(_._1).toSeq == Seq(3L, 4L))
    // a fresh subscription delivers every version regardless of age
    // (first-listing accepts all mtimes)
    import java.nio.file.attribute.FileTime
    Files.list(Paths.get(dir)).iterator().forEachRemaining { p =>
      if (p.getFileName.toString.matches("manifest-[012]\\.json"))
        Files.setLastModifiedTime(p,
          FileTime.fromMillis(System.currentTimeMillis() - 10L * 86400 * 1000))
    }
    val ckpt2 = Files.createTempDirectory(Paths.get("target"), "cdf-ckpt2")
      .toString
    seen.clear()
    val q2 = graft.streaming.CdfFollow.run(spark, table, ckpt2,
      (v, cdf) => seen.synchronized { seen += ((v, cdf.count())) })
    q2.awaitTermination(60000)
    assert(seen.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L),
      "aged manifests must not be age-pruned for a fresh follower")
    // the REAL age-pruning loss case: a resumed follower whose seen-
    // files threshold (newest mtime − maxFileAge) has already advanced
    // past a never-seen manifest's mtime — the shape of a >7-day
    // outage during which commits kept landing. Without CdfFollow's
    // explicit maxFileAge override, v5 here is silently skipped.
    val extra = graft.cdc.Decode.fromAvro(spark, s"$fixtures/insert.avro")
    assert(table.applyBatch(extra, 5L) == 5L)
    Files.setLastModifiedTime(Paths.get(dir, "manifest-5.json"),
      FileTime.fromMillis(System.currentTimeMillis() - 10L * 86400 * 1000))
    seen.clear()
    drain() // resumes from ckpt, whose newest-seen mtime is current
    assert(seen.map(_._1).toSeq == Seq(5L),
      "a backdated never-seen manifest must survive the resume threshold")
  }

  test("ManifestTail: pointer anchor, crash-lag roll-forward, empty dir") {
    import graft.cdc.ManifestTail
    val dir = Files.createTempDirectory(Paths.get("target"), "tail-unit")
    // empty table: no pointer, no manifests
    assert(ManifestTail.latest(dir, -1L) == -1L)
    // pointer current
    Files.write(dir.resolve("manifest-0.json"), "{}".getBytes)
    Files.write(dir.resolve("manifest-1.json"), "{}".getBytes)
    Files.write(dir.resolve("_LATEST"), "1".getBytes)
    assert(ManifestTail.latest(dir, -1L) == 1L)
    // crash lag: manifests published past the pointer are found by
    // the roll-forward probe
    Files.write(dir.resolve("manifest-2.json"), "{}".getBytes)
    Files.write(dir.resolve("manifest-3.json"), "{}".getBytes)
    assert(ManifestTail.latest(dir, -1L) == 3L)
    // a known lower bound below the pointer is ignored (pointer wins);
    // one above it is trusted as the probe start
    assert(ManifestTail.latest(dir, 0L) == 3L)
    assert(ManifestTail.latest(dir, 3L) == 3L)
    // corrupt pointer degrades to the lower bound, not a crash
    Files.write(dir.resolve("_LATEST"), "not-a-number".getBytes)
    assert(ManifestTail.latest(dir, 2L) == 3L)
  }

  test("CdfFollow discovery cost is tail-sized, not history-sized") {
    import graft.streaming.CdfFollow
    import graft.cdc.ManifestTail
    val dir = Files.createTempDirectory(Paths.get("target"), "cdf-tail")
    val ckpt = Files.createTempDirectory(Paths.get("target"), "cdf-tail-ck")
      .toString
    val table = new CdcTable(spark, dir.toString, Seq("id"), numBuckets = 2)
    // a long history: 40 synthetic commits (empty manifests are enough
    // for discovery — delivery degrades gracefully like vacuumed
    // versions, which is itself part of the contract under test)
    (0L to 39L).foreach(v => table.writeManifest(v, Map.empty))
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def drain(): Unit = {
      val q = CdfFollow.run(spark, table, ckpt,
        (v, _) => seen.synchronized { seen += v })
      q.awaitTermination(60000); ()
    }
    drain() // checkpoint now at version 39
    table.writeManifest(40L, Map.empty)
    table.writeManifest(41L, Map.empty)
    ManifestTail.probes.set(0)
    drain()
    val probes = ManifestTail.probes.get()
    // discovery must touch the _LATEST pointer and the unseen tail
    // only — a 40-commit history re-listed per batch would be 40+
    // filesystem touches right here
    assert(probes > 0 && probes <= 10,
      s"discovery cost grew with history: $probes probes for a 2-commit tail")
  }

  test("CdfFollow watermark suppresses redelivery when the engine replays") {
    import graft.streaming.CdfFollow
    val dir = Files.createTempDirectory(Paths.get("target"), "cdf-replay")
    val ckpt = Files.createTempDirectory(Paths.get("target"), "cdf-replay-ck")
    val table = new CdcTable(spark, dir.toString, Seq("EMPLOYEE_ID"),
      numBuckets = 4)
    Seq("dump.avro", "insert.avro").zipWithIndex.foreach { case (f, i) =>
      table.applyBatch(graft.cdc.Decode.fromAvro(spark, s"$fixtures/$f"),
        i.toLong)
    }
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def drain(): Unit = {
      val q = CdfFollow.run(spark, table, ckpt.toString,
        (v, _) => seen.synchronized { seen += v })
      q.awaitTermination(60000); ()
    }
    drain()
    assert(seen.toSeq == Seq(0L, 1L))
    // simulate an engine-level replay (foreachBatch is at-least-once):
    // wipe Spark's offset/commit logs but keep the delivered-watermark
    // — the batch re-runs from scratch, and the watermark alone must
    // keep already-delivered versions away from the consumer
    Seq("offsets", "commits").foreach { d =>
      val p = ckpt.resolve(d)
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
      }
    }
    seen.clear()
    drain()
    assert(seen.isEmpty,
      s"watermark must suppress redelivered versions, got $seen")
    // new commits still flow after the replayed batch
    table.applyBatch(
      graft.cdc.Decode.fromAvro(spark, s"$fixtures/update.avro"), 2L)
    seen.clear()
    drain()
    assert(seen.toSeq == Seq(2L))
  }
}
