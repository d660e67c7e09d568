package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def data = {
    import spark.implicits._
    val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 150L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, 90L, 1.0), (1L, 100L, 2.0), (1L, 180L, 3.0),
      (2L, 500L, 9.0)).toDF("k", "ts", "px")
    (trades, quotes)
  }

  test("backward: latest quote at-or-before each trade, with payload") {
    val (trades, quotes) = data
    val r = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts",
        rightPayload = Seq("px"))
      .collect().map(x => x.getAs[String]("trade") ->
        ((Option(x.getAs[Any]("asof_ts")), Option(x.getAs[Any]("asof_px"))))).toMap
    assert(r("t1") == ((Some(100L), Some(2.0)))) // non-strict: equal ts wins
    assert(r("t2") == ((Some(180L), Some(3.0))))
    assert(r("t3") == ((None, None))) // key 2's only quote is after
  }

  test("backward strict excludes equal timestamps") {
    val (trades, quotes) = data
    val r = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts",
        rightPayload = Seq("px"), strict = true)
      .collect().map(x => x.getAs[String]("trade") ->
        Option(x.getAs[Any]("asof_px"))).toMap
    assert(r("t1") == Some(1.0)) // 100 excluded, falls back to 90
  }

  test("forward: earliest quote at-or-after each trade") {
    val (trades, quotes) = data
    val r = AsOfJoin.forward(trades, quotes, Seq("k"), "ts", "ts",
        rightPayload = Seq("px"))
      .collect().map(x => x.getAs[String]("trade") ->
        Option(x.getAs[Any]("asof_px"))).toMap
    assert(r("t1") == Some(2.0)) // equal ts
    assert(r("t2") == None)      // nothing after 200 for key 1
    assert(r("t3") == Some(9.0)) // 500 is the next quote for key 2
  }

  test("nearest equals brute-force min-abs-gap with backward ties, randomized") {
    import spark.implicits._
    val rnd = new scala.util.Random(64)
    val left = Seq.tabulate(120)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(200).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val rightRows = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(200).toLong))
    val right = rightRows.toDF("k", "ts")

    val got = AsOfJoin.nearest(left, right, Seq("k"), "ts", "ts")
      .collect().map(x => x.getAs[Long]("lid") ->
        Option(x.getAs[Any]("nearest_ts")).map(_.asInstanceOf[Long])).toMap

    val byKey = rightRows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    left.collect().foreach { row =>
      val (k, ts, lid) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val expect = byKey.get(k).filter(_.nonEmpty).map { cands =>
        // min abs gap; at equal distance the EARLIER (backward) wins
        cands.minBy(c => (math.abs(c - ts), c))
      }
      assert(got(lid) == expect, s"lid=$lid k=$k ts=$ts")
    }
  }

  test("nearest plans both frames over one shuffle and one sort") {
    val (trades, quotes) = data
    val plan = AsOfJoin.nearest(trades, quotes, Seq("k"), "ts", "ts",
      rightPayload = Seq("px")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
    assert(sorts == 1, s"expected 1 sort, plan:\n$plan")
  }
}
