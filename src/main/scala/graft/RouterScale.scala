package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.CdcRouter

/** Many-tables router panel (round-11 verdict item 2): per-micro-batch
  * wall clock of `CdcRouter.applyBatch` as table count grows, pool
  * path (one Spark job per table, width = cores) vs the single-job
  * partitioned apply. The claim to measure: the partitioned path's
  * per-batch wall is SUB-LINEAR in table count (one Catalyst plan
  * regardless of T), while the pool path scales with T because each
  * table pays a job-scheduling round-trip.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.RouterScale"
  */
object RouterScale {

  private def key(seq: Long) = struct(lit(seq).as("ts_ms"),
    lit(seq).as("scn"), lit("").as("rs_id"), lit(0L).as("ssn"))
    .as("sort_key")

  private def batch(spark: SparkSession, nTables: Int, rowsPer: Int,
      seq: Long, op: String): DataFrame = {
    spark.range(nTables.toLong * rowsPer)
      .select(
        concat(lit("t"), (col("id") % nTables).cast("string"))
          .as("table_name"),
        struct((col("id") / nTables).cast("long").as("id"),
          concat(lit(s"$op-v$seq-"), col("id")).as("val")).as("row"),
        lit(op).as("op"), key(seq))
  }

  /** Hot-table batch: 90% of the volume lands on t0, the rest spreads
    * uniformly — the skew shape the (table_name, _bucket) repartition
    * keying exists for. Row ids stay disjoint per table so the merge
    * width matches the uniform batch's. */
  private def skewBatch(spark: SparkSession, nTables: Int, totalRows: Int,
      seq: Long, op: String): DataFrame = {
    // the cold tail spreads over (nTables - 1): one table means a
    // division by zero below, so refuse the misconfiguration loudly
    require(nTables >= 2,
      s"skewBatch needs at least 2 tables (got $nTables): 90% of the " +
        "volume lands on t0 and the rest spreads over the other tables")
    val hot = (totalRows * 0.9).toInt
    spark.range(totalRows.toLong)
      .select(
        when(col("id") < hot, lit("t0"))
          .otherwise(concat(lit("t"),
            (col("id") % (nTables - 1) + 1).cast("string")))
          .as("table_name"),
        struct(
          when(col("id") < hot, col("id"))
            .otherwise((col("id") - hot) / (nTables - 1))
            .cast("long").as("id"),
          concat(lit(s"$op-v$seq-"), col("id")).as("val")).as("row"),
        lit(op).as("op"), key(seq))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // FIXED total batch volume, varying table count: the claim under
    // test is driver/job overhead per TABLE, so data volume must not
    // be a confounder. numBuckets = 1 — the many-small-tables regime
    // (a 4-bucket layout on a 20-row table is file fragmentation, not
    // parallelism).
    // fixed per-batch volume; override to probe data-volume scaling
    // at a fixed table count (e.g. SPARK_GRAFT_ROUTER_ROWS=204800)
    val totalRows =
      sys.env.getOrElse("SPARK_GRAFT_ROUTER_ROWS", "20480").toInt
    val (sizes, modes) = args.toSeq match {
      case Nil => (Seq(64, 256, 1024), Seq("pool", "partitioned",
        "consolidated"))
      case xs =>
        val (ms, ts) = xs.partition(a => a.exists(!_.isDigit))
        (ts.map(_.toInt),
          if (ms.isEmpty) Seq("pool", "partitioned", "consolidated") else ms)
    }
    for (t <- sizes; mode <- modes) {
      val rowsPer = totalRows / t
      val root = Files.createTempDirectory(Paths.get("target"),
        s"rscale-$mode-$t").toString
      // "mixed"/"mixedpool": a HETEROGENEOUS fleet — half the tables
      // keyed (id), half (id, val) — measuring the grouped
      // partitioned apply (one single-job apply per PK-signature
      // group = 2 jobs) against the pool fallback such a fleet used
      // to take (O(tables) jobs). "mixedcons": the same fleet at
      // CONSOLIDATED physics — one store (one CAS) per PK group.
      // "skewcons"/"unicons": hot-table skew (90% of volume on t0) vs
      // uniform volume, both consolidated at numBuckets=32 — the
      // (table_name, _bucket) repartition keying must keep the hot
      // table spread across tasks instead of serializing its merge.
      // "groupskewcons": GROUP-membership skew on the consolidated
      // layout — 90% of the tables share ONE PK signature, so one
      // store's CAS+write pipeline carries 90% of the fleet's volume
      // while the sibling group idles (groups apply concurrently, but
      // one group is one commit pipeline). Expected ≈ mixedcons: the
      // hot group degenerates toward the uniform single-group case —
      // the round-13 verdict asked for this MEASURED, not asserted.
      val pkFor: String => Seq[String] =
        if (mode.startsWith("mixed"))
          n => if (n.drop(1).toInt % 2 == 0) Seq("id") else Seq("id", "val")
        else if (mode == "groupskewcons")
          n => if (n.drop(1).toInt % 10 == 0) Seq("id", "val") else Seq("id")
        else _ => Seq("id")
      val router = new CdcRouter(spark, root, pkFor,
        numBuckets = if (mode == "skewcons" || mode == "unicons") 32 else 1,
        partitionedApplyMinTables =
          if (mode == "partitioned" || mode == "mixed") 1 else Int.MaxValue,
        consolidated = mode.endsWith("cons") || mode == "consolidated")
      def mkBatch(seq: Long, op: String): DataFrame =
        if (mode == "skewcons") skewBatch(spark, t, totalRows, seq, op)
        else batch(spark, t, rowsPer, seq, op)
      // batch 0: creates; batch 1+: steady-state merge (the regime
      // that repeats every 30 s trigger — the number that matters)
      val t0 = System.nanoTime()
      router.applyBatch(mkBatch(0L, "INSERT"), 0L)
      val create = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      router.applyBatch(mkBatch(1L, "UPDATE"), 1L)
      val steady = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      router.applyBatch(mkBatch(2L, "UPDATE"), 2L)
      val steady2 = (System.nanoTime() - t2) / 1e9
      println(f"ROUTER tables=$t%5d mode=$mode%-12s " +
        f"create=$create%7.2f s steady=$steady%7.2f s " +
        f"steady2=$steady2%7.2f s " +
        f"perTable=${math.min(steady, steady2) / t * 1000}%7.1f ms")
    }
    spark.stop()
  }
}
