package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan guardrail, complementing PlanAuditSpec's
  * targeted pins: EVERY batch query on the driver surface must plan
  * without a CartesianProduct node. A cartesian is the one join shape
  * that cannot survive 100 TB under any partitioning — targeted
  * audits catch regressions in the queries they name, this sweep
  * catches the query nobody pinned.
  *
  * Streaming-family queries (real AvailableNow runs with fixed
  * per-action floors) are excluded here; their plan discipline is
  * covered by the targeted audits and StreamingOpsSpec. Broadcast
  * nested-loop joins are allowed: with one side broadcast-bounded
  * they are the designed shape of the brute-force scans (s01, s05)
  * and never shuffle row-scale data.
  */
class PlanSweepSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no query on the surface plans a CartesianProduct") {
    val batch = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.contains("stream"))
      .filterNot(_.endsWith("_sink"))
    val offenders = batch.flatMap { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
        }
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }
}
