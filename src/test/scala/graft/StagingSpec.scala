package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Staging

/** The stream-gate fixture memoization contract: build once per
  * (source path, content fingerprint); same fingerprint reuses,
  * a CHANGED fingerprint (regenerated corpus under the same path)
  * rebuilds in place, and distinct source paths keep independent
  * fixtures (no cross-sf ping-pong). */
class StagingSpec extends AnyFunSuite {

  test("builds once per fingerprint, rebuilds on content change, " +
      "keeps distinct paths independent") {
    val tag = s"stagingspec${System.nanoTime()}"
    var builds = 0
    def go(path: String, fp: String) =
      Staging.once(tag, path, fp) { dir =>
        builds += 1
        java.nio.file.Files.write(
          dir.toPath.resolve("data"), fp.getBytes)
        ()
      }
    val d1 = go("/corpus/a", "fp1")
    go("/corpus/a", "fp1")
    assert(builds == 1, "same path+fingerprint must reuse")
    // the staged bytes really are the first build's
    assert(new String(java.nio.file.Files.readAllBytes(
      d1.toPath.resolve("data"))) == "fp1")
    // regenerated corpus: same path, new fingerprint → rebuild IN the
    // same dir (stale bytes never served)
    val d2 = go("/corpus/a", "fp2")
    assert(builds == 2)
    assert(d2 == d1)
    assert(new String(java.nio.file.Files.readAllBytes(
      d2.toPath.resolve("data"))) == "fp2")
    // a different source path is an independent fixture; building it
    // must not invalidate the first
    go("/corpus/b", "fpX")
    assert(builds == 3)
    go("/corpus/a", "fp2")
    assert(builds == 3, "sibling paths must not ping-pong each other")
    // a crashed build (no marker) rebuilds
    java.nio.file.Files.delete(d1.toPath.resolve("_STAGED_OK"))
    go("/corpus/a", "fp2")
    assert(builds == 4)
    // cleanup
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    Option(new java.io.File("target").listFiles).toSeq.flatten
      .filter(_.getName.startsWith(tag)).foreach(rm)
  }

  test("fingerprint tracks file content/mtime and tree shape") {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "fpspec")
    val f = root.resolve("t.parquet")
    java.nio.file.Files.write(f, "abc".getBytes)
    val fp1 = Staging.fingerprint(f.toString)
    java.nio.file.Files.write(f, "abcd".getBytes)
    assert(Staging.fingerprint(f.toString) != fp1, "length change")
    val fp2 = Staging.fingerprint(root.toString)
    java.nio.file.Files.write(root.resolve("extra"), "x".getBytes)
    assert(Staging.fingerprint(root.toString) != fp2, "new file")
  }

  test("stream-join gates read directory-shaped corpora identically " +
      "to file-shaped ones (regression: a bare Files.copy staged a " +
      "directory corpus EMPTY; and verbatim part copies would drop " +
      "late rows under per-file triggers — the fixture re-slices by " +
      "event time)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val srcSf = "/root/testdata/sf0.001"
    // same rows, directory shape: 4 hash-distributed part files (each
    // spans the whole time range — the shape that maximally provokes
    // both failure modes)
    val edgeDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dircorpus").toString
    // each createTempDirectory path yields a NEW staging pathKey hash,
    // so leaked stage dirs would accumulate one per suite run — reap
    // exactly the temp corpus's own stage dir in the finally (the
    // sf0.001 fixture stays: other suites share it, possibly in
    // parallel)
    val edgeStage = new java.io.File(
      s"target/q66_stage_${math.abs(edgeDir.hashCode.toLong)}")
    try {
      graft.util.Tables.load(spark, srcSf, "events")
        .repartition(4)
        .write.mode("overwrite").parquet(s"$edgeDir/events.parquet")

      def run(d: String): Set[(String, Long, Long)] =
        SparkEntry.queries("q67_stream_full_join")(spark, d)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

      val fromFile = run(srcSf)
      val fromDir = run(edgeDir)
      assert(fromFile.nonEmpty && fromFile.exists(_._1 == "click_orphan"),
        "fixture must exercise both join sides") // not vacuous
      assert(fromDir == fromFile,
        s"directory-shaped corpus diverged: ${
          (fromDir diff fromFile).take(5)} missing=${
          (fromFile diff fromDir).take(5)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(edgeDir))
      rm(edgeStage)
    }
  }
}
