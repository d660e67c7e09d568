package graft.cdc

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal versioned parquet table used as the CDC merge target.
  *
  * Each `applyBatch` writes a new immutable version directory
  * (`v<N>/`) and atomically advances a `_LATEST` pointer file —
  * a deliberately tiny stand-in for a real lakehouse table format
  * (the runtime ships no Delta/Iceberg jars); same
  * read-current/merge/write-next/commit shape, so swapping in
  * `MERGE INTO` later is a one-liner. Readers always see a complete
  * version. Old versions are retained (time travel / debugging) —
  * a production deployment would vacuum by TTL, mirroring the
  * reference's 30-day purge lifecycle (util/Utils.java:860-899).
  */
class CdcTable(spark: SparkSession, path: String, pkCols: Seq[String]) {

  private val dir = Paths.get(path)
  private val latestFile = dir.resolve("_LATEST")
  Files.createDirectories(dir)

  def currentVersion: Option[Long] =
    if (Files.exists(latestFile))
      Some(new String(Files.readAllBytes(latestFile)).trim.toLong)
    else None

  def state: Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(s"$path/v$v"))

  /** Merge one micro-batch of decoded change events and commit a new
    * version. Returns the committed version number. */
  def applyBatch(events: DataFrame, batchId: Long): Long = {
    val next = currentVersion.getOrElse(-1L) + 1
    val merged = Apply.merge(state, events, pkCols, sequenceNum = batchId)
    merged.write.mode(SaveMode.Overwrite).parquet(s"$path/v$next")
    val tmp = dir.resolve(s"_LATEST.tmp$next")
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, latestFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Current live rows (soft-deleted hidden, bookkeeping dropped). */
  def live: Option[DataFrame] = state.map(Apply.liveView)
}
