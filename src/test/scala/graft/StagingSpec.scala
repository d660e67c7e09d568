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
}
