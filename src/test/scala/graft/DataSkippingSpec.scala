package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.CdcTable

/** Data-skipping read paths on the versioned table:
  *
  *  - `lookup`: PK point reads touch only the hashed buckets
  *  - `clusterBy` + `scanWhere`: range-clustered files carry [min,max]
  *    stats; a selective range prunes non-intersecting files
  *
  * Both are asserted on the files actually TOUCHED (input_file_name /
  * filesFor), not just on result equality — skipping that silently
  * reads everything would pass a result check and still melt at 100 TB.
  */
class DataSkippingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String) =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def key(scn: Long) =
    struct(lit(0L).as("ts_ms"), lit(scn).as("scn"),
      lit("").as("rs_id"), lit(0L).as("ssn")).as("sort_key")

  private def seed(dir: String, nBuckets: Int): CdcTable = {
    import spark.implicits._
    val t = new CdcTable(spark, dir, Seq("id"), numBuckets = nBuckets)
    val rows = (0L until 400L).map(i => (i, i % 100, s"p$i")).toDF("id", "v", "p")
      .select(struct($"id", $"v", $"p").as("row"),
        lit("INSERT").as("op"), key(1L))
    t.applyBatch(rows, 0L)
    t
  }

  test("lookup reads only the keys' hash buckets and matches a full-state filter") {
    import spark.implicits._
    val t = seed(tmp("skiplk"), nBuckets = 8)
    val keys = Seq(3L, 7L, 250L).toDF("id")
    val got = t.lookup(keys).get
    assert(got.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 7L, 250L))
    // bucket dirs actually touched ⊆ the keys' hash buckets (≤ 3 of 8)
    val touched = got.select(input_file_name()).distinct().collect()
      .map(_.getString(0).split("/").takeRight(2).head).distinct
    assert(touched.length <= 3, touched.toSeq)
    val full = t.state.get.join(broadcast(keys), Seq("id"), "left_semi")
    assert(got.orderBy("id").collect().toSeq ==
      full.orderBy("id").collect().toSeq)
  }

  test("lookup normalizes key types to the committed PK types") {
    import spark.implicits._
    val t = seed(tmp("skiplt"), nBuckets = 8)
    // xxhash64 hashes values AS TYPED: an INT key column against the
    // table's BIGINT PK would hash to different buckets and the pruned
    // read would silently return nothing. lookup must cast first.
    val intKeys = Seq(3, 7, 250).toDF("id") // IntegerType, table is LongType
    val got = t.lookup(intKeys).get
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 7L, 250L))
    // string-typed keys normalize the same way
    val strKeys = Seq("3", "250").toDF("id")
    assert(t.lookup(strKeys).get.select("id").as[Long]
      .collect().sorted.toSeq == Seq(3L, 250L))
    // a keys frame missing the PK column fails fast, not silently empty
    intercept[Exception] { t.lookup(Seq(1L).toDF("nope")).get.collect() }
  }

  test("clusterBy records per-file stats; scanWhere prunes and stays exact") {
    import spark.implicits._
    val t = seed(tmp("skipcl"), nBuckets = 4)
    val v = t.clusterBy("v", filesPerBucket = 4)
    assert(v.contains(1L))
    // selective range: v in [10, 19] — 10% of the value space should
    // keep ~1/4 of the files (range-disjoint within each bucket)
    val (kept, total) = t.filesFor("v", BigDecimal(10), BigDecimal(19))
    assert(total >= 8, s"expected multiple files, got $total")
    assert(kept.size * 2 < total, s"kept ${kept.size} of $total — no pruning")
    val got = t.scanWhere("v", BigDecimal(10), BigDecimal(19)).get
    val want = t.state.get.filter($"v" >= 10 && $"v" <= 19)
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      want.select("id").as[Long].collect().sorted.toSeq)
    assert(got.count() == 40L)
  }

  test("shallow clone carries metadata: schema fast path, DDL history, " +
      "and data-skipping stats keyed to the re-pointed dirs") {
    import spark.implicits._
    val t = seed(tmp("skipclonesrc"), nBuckets = 4)
    t.clusterBy("v", filesPerBucket = 4)
    val dst = tmp("skipclonedst")
    val clone = t.cloneAt(1L, dst).get
    // the small sidecars travelled (Delta/Iceberg shallow-clone
    // semantics: metadata copies, data does not)
    assert(Files.exists(Paths.get(dst, "_schema.json")), "_schema.json")
    assert(clone.ddlEvents.nonEmpty, "_ddl.jsonl")
    // stats keys were rewritten to the clone's re-pointed dir names,
    // so the clone prunes exactly like the source
    val (srcKept, srcTotal) = t.filesFor("v", BigDecimal(10), BigDecimal(19))
    val (cloneKept, cloneTotal) =
      clone.filesFor("v", BigDecimal(10), BigDecimal(19))
    assert(cloneTotal == srcTotal)
    assert(cloneKept.size == srcKept.size,
      s"clone kept ${cloneKept.size} of $cloneTotal, source ${srcKept.size}")
    assert(cloneKept.size * 2 < cloneTotal, "clone lost pruning")
    // and the pruned scan is still exact
    val got = clone.scanWhere("v", BigDecimal(10), BigDecimal(19)).get
    assert(got.count() == 40L)
  }

  test("post-clustering merges stay correct: new files lack stats and are read") {
    import spark.implicits._
    val t = seed(tmp("skipmg"), nBuckets = 4)
    t.clusterBy("v", filesPerBucket = 4)
    // a later batch moves id=0 into the [10,19] range (v: 0 → 15)
    val upd = Seq((0L, 15L, "p0x")).toDF("id", "v", "p")
      .select(struct($"id", $"v", $"p").as("row"),
        lit("UPDATE").as("op"), key(2L))
    t.applyBatch(upd, 1L)
    val got = t.scanWhere("v", BigDecimal(10), BigDecimal(19)).get
    assert(got.filter($"id" === 0L).count() == 1L) // unpruned new file seen
    assert(got.count() == 41L)
    // and the stale pre-image did not resurface
    assert(got.filter($"id" === 0L && $"p" =!= "p0x").count() == 0L)
  }

  test("Z-order clustering prunes on BOTH dimensions; results stay exact") {
    import spark.implicits._
    val dir = tmp("skipzo")
    val t = new CdcTable(spark, dir, Seq("id"), numBuckets = 2)
    // two pseudo-independent dimensions over 800 rows
    val rows = (0L until 800L)
      .map(i => (i, i % 100, (i * 37) % 100, s"p$i"))
      .toDF("id", "v", "u", "p")
      .select(struct($"id", $"v", $"u", $"p").as("row"),
        lit("INSERT").as("op"), key(1L))
    t.applyBatch(rows, 0L)
    assert(t.clusterZOrder(Seq("v", "u"), filesPerBucket = 8).contains(1L))
    // a 10%-of-space range on EITHER dimension prunes files — the
    // property single-column clustering cannot give for the second col
    for (c <- Seq("v", "u")) {
      val (kept, total) = t.filesFor(c, BigDecimal(10), BigDecimal(19))
      assert(total >= 8, s"$c: expected many files, got $total")
      assert(kept.size < total, s"$c: kept ${kept.size} of $total — no pruning")
      val got = t.scanWhere(c, BigDecimal(10), BigDecimal(19)).get
      val want = t.state.get.filter(col(c) >= 10 && col(c) <= 19)
      assert(got.select("id").as[Long].collect().sorted.toSeq ==
        want.select("id").as[Long].collect().sorted.toSeq, s"$c mismatch")
    }
  }

  test("clusterBy on a non-numeric column fails fast, before any rewrite") {
    val t = seed(tmp("skipnn"), nBuckets = 2)
    val e = intercept[IllegalArgumentException] { t.clusterBy("p") }
    assert(e.getMessage.contains("numeric"))
    val missing = intercept[IllegalArgumentException] { t.clusterBy("nope") }
    assert(missing.getMessage.contains("no column"))
    assert(t.currentVersion.contains(0L)) // nothing committed
  }

  test("scanWhere with an empty match returns no rows, not an error") {
    val t = seed(tmp("skipem"), nBuckets = 4)
    t.clusterBy("v", filesPerBucket = 4)
    assert(t.scanWhere("v", BigDecimal(1000), BigDecimal(2000)).get.count() == 0L)
  }

  test("stats commit rides the manifest CAS: a clusterBy that loses the " +
      "race leaves ZERO orphan stats lines (crash injection)") {
    val dirS = tmp("skipcas")
    val t = seed(dirS, nBuckets = 4) // committed v0
    // inject the race: a concurrent writer has already published a
    // v1 bucket dir (but not its manifest — ManifestTail would roll
    // forward over a committed one). clusterBy stages its rewrite,
    // computes and stages the stats lines, then loses the publish —
    // the exact "stats written, manifest not" window of the round-8
    // limitation
    Files.createDirectory(Paths.get(dirS, "b0-v1"))
    intercept[graft.cdc.ConcurrentCommitException] { t.clusterBy("v") }
    // zero orphans: no versioned stats file became visible, no legacy
    // sidecar was appended, no staging residue
    val residue = Files.list(Paths.get(dirS)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (residue.hasNext) names += residue.next().getFileName.toString
    assert(!names.exists(_.startsWith("_filestats")), names.toSeq)
    assert(!names.exists(_.contains("staging")), names.toSeq)
    // and pruning metadata is genuinely empty: every file is kept
    val (kept, total) = t.filesFor("v", BigDecimal(0), BigDecimal(0))
    assert(kept.size == total, s"stats from an uncommitted version " +
      s"pruned files: ${kept.size} of $total")
  }

  test("stats file appears only WITH its committed version, and a " +
      "recovered retry re-records stats") {
    val dirS = tmp("skipcas2")
    val t = seed(dirS, nBuckets = 4)
    assert(t.clusterBy("v", filesPerBucket = 4).contains(1L))
    // the stats sidecar is version-named and its manifest exists
    assert(Files.exists(Paths.get(dirS, "_filestats-1.jsonl")))
    assert(Files.exists(Paths.get(dirS, "manifest-1.json")))
    // a later clustering pass commits v2 with its own stats — both
    // versions' lines resolve (keys are immutable file paths)
    assert(t.clusterBy("v", filesPerBucket = 2).contains(2L))
    assert(Files.exists(Paths.get(dirS, "_filestats-2.jsonl")))
    val (kept, total) = t.filesFor("v", BigDecimal(10), BigDecimal(19))
    assert(total > 0 && kept.size < total,
      s"post-retry pruning lost: ${kept.size} of $total")
  }
}
