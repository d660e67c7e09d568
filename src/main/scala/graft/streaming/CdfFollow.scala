package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.cdc.CdcTable

/** Follow a CdcTable's commit log as a Structured Streaming query —
  * the streaming half of the change-data-feed story: downstream
  * incremental view maintenance subscribes to the table and receives
  * each commit's CDF rows (pre/post images, `changeFeedCdf`) exactly
  * once, in version order.
  *
  * Spark-first design: version discovery rides the built-in file
  * stream source over `manifest-*.json` — the manifests are published
  * with ATOMIC_MOVE, so a half-written manifest is never visible, and
  * the file source's checkpointed file log is what makes delivery
  * exactly-once across restarts (no bespoke offset tracking to get
  * wrong). Each micro-batch hands the NEW manifest versions, sorted
  * ascending, to `onVersion` with that version's CDF DataFrame.
  *
  * At 100 TB nothing here scales with table size: a micro-batch
  * carries a handful of manifest rows, and each `changeFeedCdf(v)`
  * reads only the buckets version v re-pointed.
  */
object CdfFollow {

  /** Start following `table`. `onVersion(v, cdf)` runs once per
    * committed version, ascending within and across batches; versions
    * whose pre-image manifest was vacuumed are skipped (same graceful
    * degradation as `changeFeedCdf`). Stop via the returned query. */
  def run(spark: SparkSession, table: CdcTable,
      checkpointDir: String, onVersion: (Long, org.apache.spark.sql.DataFrame) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val manifests = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .format("text")
      // the file source's default maxFileAge (7 days) would silently
      // skip older manifests when a FRESH subscription starts on an
      // old table — a follower must see every committed version, so
      // age-based pruning is disabled (the CDC source's 3-day SLA
      // window is a different contract for a different directory)
      .option("maxFileAge", "36500d")
      .load(s"${table.location}/manifest-*.json")
      .select(col("_metadata.file_path").as("path"))
    manifests.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val versions = batch.select(col("path")).distinct().collect()
          .map(_.getString(0))
          .flatMap { p =>
            "manifest-(\\d+)\\.json$".r.findFirstMatchIn(p)
              .map(_.group(1).toLong)
          }
          .sorted
        versions.foreach { v =>
          table.changeFeedCdf(v).foreach(cdf => onVersion(v, cdf))
        }
        ()
      }
      .start()
  }
}
