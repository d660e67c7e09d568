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
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q30_approx_sketches")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL off by >5%: $approx vs $exact")
    }
    // approx median within the exact p40..p60 band
    val bands = graft.util.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.4)").as("lo"),
        expr("percentile(l_extendedprice, 0.6)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (lo, hi) = bands(r.getAs[String]("l_returnflag"))
      val m = r.getAs[Double]("approx_median")
      assert(m >= lo && m <= hi, s"approx median $m outside [$lo,$hi]")
    }
  }
}
