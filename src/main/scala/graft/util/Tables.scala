package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated corpus (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst can push filters and
  * prune columns down to the file source. A few session confs are set
  * idempotently here so the queries behave identically no matter who
  * constructed the SparkSession (our Verify/Bench mains or the driver):
  *  - UTC session timezone (oracle parity with DuckDB's naive timestamps)
  *  - nanosAsLong: `events.ts` is parquet TIMESTAMP(NANOS) which Spark
  *    does not support natively; we read it as a long and convert.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}

/** Column helpers shared by the query surface.
  *
  * Oracle-determinism strategy: double-typed source columns are cast to
  * DECIMAL(18,4) before any arithmetic/aggregation so that Spark and the
  * DuckDB oracle perform the exact same (exact, order-independent)
  * decimal arithmetic; averages/ratios are then computed as a single
  * IEEE double division of identical operands. This removes
  * floating-point summation-order nondeterminism from the hash compare.
  */
object Cols {
  /** Exact fixed-point view of a double column. */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Canonical output type for decimal aggregates (matches DuckDB's
    * SUM(DECIMAL(18,4)) result type). */
  def big4(c: Column): Column = c.cast(DecimalType(38, 4))
}
