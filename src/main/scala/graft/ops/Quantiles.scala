package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact continuous quantiles (SQL `percentile_cont` semantics) via
  * distributed sort, replacing Spark's map-based `percentile`
  * aggregate for large/continuous domains.
  *
  * Why not the built-in: `percentile()` accumulates a per-group
  * OpenHashMap of value→count and ships the whole map through the
  * shuffle. On a continuous column (prices, scores) the map is nearly
  * row-count-sized, so partial aggregation buys nothing, the shuffle
  * carries the data twice (key + count per distinct value), and the
  * final sort of each group's map happens in ONE task's heap —
  * memory-unbounded as groups grow. At 100 TB a hot group OOMs its
  * executor.
  *
  * This shape instead: explode the requested (metric, p) pairs,
  * shuffle ONCE on (group, metric), sort within partitions (spillable
  * SortExec, never a heap map), rank with `row_number`, and keep only
  * the two rows bracketing the target index `(n-1)·p` — the filter
  * collapses the sorted data to ≤2 rows per (group, metric) before
  * the tiny final aggregate interpolates them. Work is O(n log n) per
  * group with disk-backed sort; memory is bounded by Spark's sort
  * buffers regardless of group size or value cardinality.
  *
  * Interpolation matches Spark's `Percentile.getPercentile` and
  * DuckDB's `quantile_cont`: `v_lo + frac·(v_hi − v_lo)` at position
  * `(n−1)·p`. Nulls are ignored (as the built-in does); a group whose
  * values are all null is absent from the output.
  */
object Quantiles {

  /** One row per `grpCol` value, one column per metric.
    *
    * @param metrics (outputColumn, valueColumn, p) triples; all are
    *                computed in the single shuffle.
    */
  def quantileCont(df: DataFrame, grpCol: String,
      metrics: Seq[(String, String, Double)]): DataFrame = {
    require(metrics.nonEmpty, "at least one (out, value, p) metric")
    val g = col(grpCol)
    val pairs = metrics.map { case (out, v, p) =>
      struct(lit(out).as("m"), col(v).cast("double").as("v"),
        lit(p).as("p"))
    }
    val wOrd = Window.partitionBy(g, col("m")).orderBy(col("v"))
    val wAll = Window.partitionBy(g, col("m"))
    val bracketed = df
      .select(g, explode(array(pairs: _*)).as("e"))
      .select(g, col("e.m").as("m"), col("e.v").as("v"), col("e.p").as("p"))
      .filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("tgt", (count(lit(1)).over(wAll) - 1) * col("p"))
      .filter(col("rn") === floor(col("tgt")) + 1 ||
        col("rn") === ceil(col("tgt")) + 1)

    // ≤2 rows per (group, metric) from here on. min = v_lo, max = v_hi
    // (equal when the target lands exactly on an index and only one
    // row survives the bracket filter).
    val perMetric = bracketed
      .groupBy(g, col("m"))
      .agg((min(col("v")) +
        (first(col("tgt")) - floor(first(col("tgt")))) *
          (max(col("v")) - min(col("v")))).as("q"))

    val outCols: Seq[Column] = metrics.map { case (out, _, _) =>
      max(when(col("m") === out, col("q"))).as(out)
    }
    perMetric.groupBy(g).agg(outCols.head, outCols.tail: _*)
  }
}
