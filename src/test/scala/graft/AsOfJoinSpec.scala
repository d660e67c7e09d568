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
}
