package graft

import org.apache.spark.sql.SparkSession

/** Public entry point: a SparkSession tuned for this engine with the
  * native functions registered — what a user of the reference plugin
  * switches to.
  *
  * {{{
  *   val spark = GraftSession.build()          // local dev
  *   val spark = GraftSession.build("yarn", 256) // cluster
  * }}}
  */
object GraftSession {

  def build(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events-style TIMESTAMP(NANOS) parquet columns read as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    GraftExtensions.install(spark) // effective even on a reused session
    spark
  }
}
