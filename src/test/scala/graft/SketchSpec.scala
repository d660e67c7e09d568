package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound checks for the approximate sketches (their values are
  * implementation-defined, so the oracle gate only row-checks them;
  * accuracy is asserted here instead). */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("approx_count_distinct and approx_percentile stay near exact") {
    // tighter spec-level bounds than the q30 driver gate (5% HLL /
    // p40-p60 band vs the gate's 10% / p49-p51), asserted on the raw
    // sketch aggregates — the gate query itself now emits only the
    // bound flags
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.util.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"),
        expr("percentile(l_extendedprice, 0.4)").as("lo"),
        expr("percentile(l_extendedprice, 0.6)").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL off by >5%: $approx vs $exact")
      val m = r.getAs[Double]("approx_median")
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(m >= lo && m <= hi, s"approx median $m outside [$lo,$hi]")
    }
    // and the driver gate's flags hold
    val gate = SparkEntry.queries("q30_approx_sketches")(
      spark, "/root/testdata/sf0.01").collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      assert(r.getAs[Long]("hll_pass") == 1L && r.getAs[Long]("median_pass") == 1L,
        r.toString)
    }
  }
}
