package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.CdcTable

/** Follow a CdcTable's commit log as a Structured Streaming query —
  * the streaming half of the change-data-feed story: downstream
  * incremental view maintenance subscribes to the table and receives
  * each commit's CDF rows (pre/post images, `changeFeedCdf`) in
  * version order.
  *
  * Spark-first design: version discovery is a DataSource V2
  * micro-batch source ([[CdcLogSource]]) whose OFFSETS are manifest
  * version numbers, checkpointed by Spark's offset log. Because the
  * log is dense, discovery is a `_LATEST`-pointer read plus tail
  * probes — never a directory listing — so a micro-batch on a table
  * with a million historical commits touches only the unseen tail
  * (the built-in file source this replaced re-listed every
  * `manifest-*.json` each batch and compacted an ever-growing
  * seen-files log into the checkpoint: both O(history), forever).
  *
  * Delivery semantics: the version offsets are exactly-once (Spark's
  * offset log), but `foreachBatch` is at-least-once — a batch retried
  * after a failure re-runs its handler. A `delivered-watermark` file
  * in the checkpoint directory (updated via atomic move after each
  * `onVersion` returns) deduplicates those retries AND cross-restart
  * replays, so `onVersion` sees each version once in normal operation
  * and once more only in the hard-crash window between its own return
  * and the watermark write. Consumers that cannot tolerate that
  * single-version crash window must be idempotent on version number.
  *
  * At 100 TB nothing here scales with table size or history: a
  * micro-batch carries version numbers, and each `changeFeedCdf(v)`
  * reads only the buckets version v re-pointed.
  */
object CdfFollow {

  /** Start following `table`. `onVersion(v, cdf)` runs once per
    * committed version (see delivery semantics above), ascending
    * within and across batches; versions whose pre-image manifest was
    * vacuumed are skipped (same graceful degradation as
    * `changeFeedCdf`). Stop via the returned query. */
  def run(spark: SparkSession, table: CdcTable,
      checkpointDir: String, onVersion: (Long, org.apache.spark.sql.DataFrame) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    follow(spark, table.location, consolidated = false, checkpointDir,
      trigger) { v =>
      table.changeFeedCdf(v).foreach(cdf => onVersion(v, cdf))
    }

  /** Follow a CONSOLIDATED store's fleet commit log — ONE streaming
    * query (one offset log, one tail probe per trigger) subscribes a
    * downstream IVM to EVERY table in a 4,096-table fleet; per-table
    * CdfFollow loops would pay all of that per table. `onVersion(v,
    * table, cdf)` runs once per (commit, table-present-at-v) in
    * ascending version order, tables alphabetical within a commit;
    * commits that didn't re-point a table deliver its empty feed (the
    * store's changeFeedCdf contract), so consumers fold zero deltas —
    * still version-aligned. Cost per commit stays O(touched): the
    * untouched tables' feeds prune to a limit(0) on one bucket read,
    * and touched tables read only their re-pointed segments. Delivery
    * semantics (watermark dedup, single-version crash window) match
    * [[run]] with one sharper edge: the watermark advances per
    * VERSION, after all of its tables delivered — a crash mid-version
    * re-delivers ALL of that version's tables on retry, so a consumer
    * must either apply a version atomically or be idempotent on
    * (version, table), the same contract [[run]] states per version. */
  def runStore(spark: SparkSession, store: graft.cdc.ConsolidatedStore,
      checkpointDir: String,
      onVersion: (Long, String, org.apache.spark.sql.DataFrame) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    follow(spark, store.location, consolidated = true, checkpointDir,
      trigger) { v =>
      store.tablesAt(v).foreach { t =>
        store.changeFeedCdf(t, v).foreach(cdf => onVersion(v, t, cdf))
      }
    }

  private def follow(spark: SparkSession, logDir: String,
      consolidated: Boolean, checkpointDir: String, trigger: Trigger)
      (deliver: Long => Unit): StreamingQuery = {
    val marker = Paths.get(checkpointDir, "delivered-watermark")
    def delivered(): Long =
      if (!Files.exists(marker)) -1L
      else
        try new String(Files.readAllBytes(marker)).trim.toLong
        catch { case _: Exception => -1L }
    def advance(v: Long): Unit = {
      val tmp = Paths.get(checkpointDir, s".delivered-watermark.tmp")
      Files.createDirectories(tmp.getParent)
      Files.write(tmp, v.toString.getBytes)
      Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    val versions = spark.readStream
      .format("graft.streaming.CdcLogSource")
      .option("layout", if (consolidated) "consolidated" else "table")
      .load(logDir)
    versions.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = batch.select(col("version")).collect().map(_.getLong(0))
          .sorted
        val maxSeen = delivered()
        vs.filter(_ > maxSeen).foreach { v =>
          deliver(v)
          advance(v)
        }
        ()
      }
      .start()
  }
}
