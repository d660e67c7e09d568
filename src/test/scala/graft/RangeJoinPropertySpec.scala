package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Algebraic check of the binned interval join against an in-memory
  * brute force, over longs that include the ranges where double
  * arithmetic misbins (±2^53 neighborhoods, ~2^60 magnitudes — the
  * ns-epoch regime the round-2 advisor flagged). Binning gates the
  * equi-join, so a single misbinned value silently DROPS pairs; this
  * property is the regression net for that class of bug. */
class RangeJoinPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val value: Gen[Long] = Gen.oneOf(
    Gen.choose(-2000L, 2000L),
    Gen.choose((1L << 53) - 5000L, (1L << 53) + 5000L),
    Gen.choose(-(1L << 53) - 5000L, -(1L << 53) + 5000L),
    Gen.choose(-(1L << 60), 1L << 60))

  test("binned interval join equals brute force, including beyond 2^53") {
    import spark.implicits._
    val cases = for {
      ls <- Gen.listOfN(20, value)
      rs <- Gen.listOfN(20, value)
      lower <- Gen.choose(-1000000L, 1000000L)
      width <- Gen.choose(1L, 2000000L)
    } yield (ls, rs, lower, lower + width)

    val prop = Prop.forAll(cases) { case (ls, rs, lower, upper) =>
      val left = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("lid", "lv")
      val right = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("rid", "rv")
      val got = RangeJoin.interval(left, right, "lv", "rv", lower, upper)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (lv, li) <- ls.zipWithIndex
        (rv, ri) <- rs.zipWithIndex
        if rv >= lv + lower && rv <= lv + upper
      } yield (li.toLong, ri.toLong)).toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("a pair straddling a bin edge above 2^53 survives") {
    import spark.implicits._
    // (1L<<53) + 1 is where double long-division starts losing ulps
    val base = (1L << 53) + 1L
    val left = Seq((1L, base)).toDF("lid", "lv")
    val right = Seq((1L, base + 999L)).toDF("rid", "rv")
    val got = RangeJoin.interval(left, right, "lv", "rv", 0L, 1000L)
      .select("lid", "rid").collect()
    assert(got.length == 1)
  }
}
