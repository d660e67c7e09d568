package graft.util

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Small driver-side filesystem helpers shared by the staging sweeps
  * (CdcTable and the router root). Kept together so the one subtle
  * invariant — the age gate tracks the NEWEST mtime anywhere under a
  * dir, and a vanished entry means ACTIVITY — has a single home. */
private[graft] object Fs {

  /** Directory listing with the stream closed (Files.list leaks an
    * open directory fd otherwise). */
  def withListing[T](p: Path)(f: Iterator[Path] => T): T = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Newest last-modified time anywhere under `p`. A long partitioned
    * parquet write mutates only NESTED entries (`_bucket=N/_temporary`
    * files), so a live writer whose write outlasts a sweep window
    * looks idle at the root — age gates must recurse. A LIVE writer
    * deleting/renaming entries mid-walk surfaces as NoSuchFile/
    * DirectoryIterator/UncheckedIO exceptions; a vanished entry means
    * activity, so the dir reports maximally fresh rather than crashing
    * the sweep or being swept while written. */
  def newestMtime(p: Path): Long =
    try {
      val own = Files.getLastModifiedTime(p).toMillis
      if (!Files.isDirectory(p)) own
      else math.max(own,
        withListing(p)(_.map(newestMtime).foldLeft(0L)(math.max)))
    } catch {
      case _: java.nio.file.NoSuchFileException |
           _: java.nio.file.DirectoryIteratorException |
           _: java.io.UncheckedIOException => Long.MaxValue
    }

  /** Total file bytes under `p` (0 if absent). Same vanished-entry
    * tolerance as [[newestMtime]]: a concurrent delete mid-walk
    * reports what was seen, never crashes a maintenance signal. */
  def sizeOf(p: Path): Long =
    try {
      if (!Files.exists(p)) 0L
      else if (!Files.isDirectory(p)) Files.size(p)
      else withListing(p)(_.map(sizeOf).sum)
    } catch {
      case _: java.nio.file.NoSuchFileException |
           _: java.nio.file.DirectoryIteratorException |
           _: java.io.UncheckedIOException => 0L
    }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      withListing(p)(_.toSeq).foreach(deleteRecursively)
    Files.deleteIfExists(p)
    ()
  }
}
