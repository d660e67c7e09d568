package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key evidence for the CDC merge path (round-10 verdict item 7):
  * the realistic 100× hazard on `cdc/Apply` is a CDC feed where one
  * PK is updated millions of times per batch (a counter row, a
  * heartbeat). This panel builds a batch with 90% of all events on
  * ONE key, runs collapse→merge, and compares against a uniform batch
  * of the same size — and against the window formulation of collapse
  * (what Apply used before round 10) to show WHY collapse is an
  * aggregate: a window cannot partially aggregate, so the hot key's
  * whole event pile sorts in one task, while `max_by` map-side-
  * combines it to one row per input partition before the exchange.
  * Collapse-before-merge then feeds the PK join exactly one row per
  * key — the join never sees the skew at all.
  *
  * Usage: runMain graft.MergeSkew [nRows] — prints one JSON line.
  */
object MergeSkew {

  private def batch(spark: SparkSession, n: Long, hot: Boolean): DataFrame = {
    val nKeys = math.max(1L, n / 10)
    val key =
      if (hot) when(rand(7) < 0.9, lit(0L))
        .otherwise((rand(11) * nKeys).cast("long") + 1)
      else (rand(11) * nKeys).cast("long") + 1
    spark.range(n)
      .select(
        when(rand(13) < 0.05, "DELETE").otherwise("UPDATE-INSERT").as("op"),
        struct(key.as("id"),
          concat(lit("v"), col("id")).as("val")).as("row"),
        struct(col("id").as("ts"), lit(0L).as("ssn")).as("sort_key"))
  }

  /** The pre-round-10 window formulation, kept here as the
    * measurement baseline. */
  private def windowCollapse(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("row.id"))
      .orderBy(col("sort_key").desc,
        when(col("op") === "DELETE", 1).otherwise(0).desc)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4_000_000L)
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

    val state = spark.range(math.max(1L, n / 10) + 1)
      .select(col("id"), concat(lit("s"), col("id")).as("val"),
        lit(false).as("_is_deleted"), lit(0L).as("_sequence_num"),
        struct(lit(-1L).as("ts"), lit(0L).as("ssn")).as("_sort_key"))
      .localCheckpoint(true)

    def mergeWall(hot: Boolean): (Double, Long) = {
      val ev = batch(spark, n, hot).localCheckpoint(true) // exclude gen cost
      val r = time(graft.cdc.Apply.merge(Some(state), ev, Seq("id"), 1L)
        .filter(!col("_is_deleted")).count())
      ev.unpersist(); r
    }
    // warm up codegen/shuffle paths once
    graft.cdc.Apply.merge(Some(state.limit(1000)),
      batch(spark, 10000, hot = true), Seq("id"), 1L).count()

    val (wallUniform, nUniform) = mergeWall(hot = false)
    val (wallHot, nHot) = mergeWall(hot = true)
    val evHot = batch(spark, n, hot = true).localCheckpoint(true)
    val (wallWindowHot, _) = time(windowCollapse(evHot).count())
    val (wallAggHot, _) = time(graft.cdc.Apply.collapse(evHot, Seq("id")).count())
    evHot.unpersist()

    println(s"""{"metric":"merge_skew","n_events":$n""" +
      s""","hot_share":0.9,"wall_merge_uniform":$wallUniform""" +
      s""","wall_merge_hot":$wallHot""" +
      s""","hot_over_uniform":${wallHot / wallUniform}""" +
      s""","wall_collapse_window_hot":$wallWindowHot""" +
      s""","wall_collapse_agg_hot":$wallAggHot""" +
      s""","window_over_agg":${wallWindowHot / wallAggHot}""" +
      s""","n_out_uniform":$nUniform,"n_out_hot":$nHot}""")
    spark.stop()
  }
}
