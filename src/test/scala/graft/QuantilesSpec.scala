package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quantiles

/** Sort-based exact quantiles vs Spark's built-in `percentile`
  * aggregate: same semantics (percentile_cont interpolation, nulls
  * ignored), different physical shape (distributed sort + bracket
  * filter instead of a per-group value-count map). */
class QuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def compare(rows: Seq[(String, Double)], ps: Seq[Double]): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v")
    val metrics = ps.zipWithIndex.map { case (p, i) => (s"q$i", "v", p) }
    val got = Quantiles.quantileCont(df, "g", metrics)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(i + 1))).toMap
    val want = df.groupBy($"g")
      .agg(ps.zipWithIndex.map { case (p, i) =>
          expr(s"percentile(v, $p)").as(s"q$i")
        }.head,
        ps.zipWithIndex.drop(1).map { case (p, i) =>
          expr(s"percentile(v, $p)").as(s"q$i") }: _*)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(i + 1))).toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet; i <- ps.indices)
      assert(math.abs(got(k)(i) - want(k)(i)) < 1e-9,
        s"group $k p=${ps(i)}: got ${got(k)(i)} want ${want(k)(i)}")
  }

  test("matches the built-in on deterministic pseudo-random groups") {
    // LCG keeps the fixture reproducible without Random
    var seed = 12345L
    def next(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (seed >>> 11).toDouble / (1L << 53).toDouble
    }
    val rows = for (g <- Seq("a", "b", "c"); _ <- 1 to 257)
      yield (g, next() * 1000.0)
    compare(rows, Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0))
  }

  test("exact-index targets (frac = 0) and tiny groups") {
    // 5 values: p=0.5 lands exactly on index 2 — one bracket row
    compare(Seq("g" -> 1.0, "g" -> 2.0, "g" -> 3.0, "g" -> 4.0,
      "g" -> 5.0), Seq(0.25, 0.5, 0.75))
    // single-row group: every p returns the value
    compare(Seq("solo" -> 42.0), Seq(0.0, 0.5, 1.0))
    // two rows: pure interpolation
    compare(Seq("two" -> 10.0, "two" -> 20.0), Seq(0.3, 0.5))
  }

  test("duplicate values and nulls") {
    import spark.implicits._
    val df = Seq(("g", Some(1.0)), ("g", Some(1.0)), ("g", Some(1.0)),
      ("g", Some(9.0)), ("g", None), ("allnull", None))
      .toDF("g", "v")
    val out = Quantiles.quantileCont(df, "g", Seq(("med", "v", 0.5)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // nulls ignored: median of (1,1,1,9) = 1.0; all-null group absent
    assert(out == Map("g" -> 1.0))
  }

  test("multiple metrics over different columns share one shuffle") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 30.0), (1L, 4.0, 10.0), (2L, 6.0, 20.0))
      .toDF("k", "x", "y").withColumn("k", $"k".cast("string"))
    val out = Quantiles.quantileCont(df, "k",
        Seq(("mx", "x", 0.5), ("py", "y", 1.0)))
      .orderBy($"k").collect()
    assert(out(0).getDouble(1) == 3.0 && out(0).getDouble(2) == 30.0)
    assert(out(1).getDouble(1) == 6.0 && out(1).getDouble(2) == 20.0)
    // physical shape: exactly one exchange feeds the window sort
    val plan = Quantiles.quantileCont(df, "k",
      Seq(("mx", "x", 0.5), ("py", "y", 1.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }
}
