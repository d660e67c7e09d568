package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval (range) join: pairs where
  * `right.rightOn ∈ [left.leftOn + lower, left.leftOn + upper]`.
  *
  * A plain range predicate gives Spark a broadcast-nested-loop plan —
  * O(|L|·|R|) comparisons regardless of how narrow the window is. The
  * binned form turns it into a shuffle-partitionable EQUI-join: both
  * sides key by `floor(value / w)` with w = window width, the left
  * side duplicated into the (≤ 2) bins its window overlaps, and the
  * exact bounds re-checked after the match. Work becomes proportional
  * to rows sharing a bin — at 100 TB, time-bin co-partitioning instead
  * of a cross product. (The same binning idea as the LSH bucket joins:
  * candidates from an equi-key, exactness from a post-filter.)
  *
  * Column names must be disjoint between the two sides (standard for
  * join helpers here); `keys` adds extra equi-join columns shared by
  * both sides (e.g. a user id), which further partitions the bins.
  */
object RangeJoin {

  /** Exact floor(c / w) on longs. Integral all the way: Spark's `/`
    * is DOUBLE division, which above 2^53 (ns-epoch timestamps) can
    * round the quotient down a bin — and since the bin gates the
    * equi-join, a wrong bin silently DROPS matching pairs. The
    * numerator is divisible by w by construction, so `div`
    * (IntegralDivide) is exact floor for any long. */
  private def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  def interval(left: DataFrame, right: DataFrame,
      leftOn: String, rightOn: String,
      lower: Long, upper: Long, keys: Seq[String] = Nil): DataFrame = {
    require(upper >= lower, s"empty window: [$lower, $upper]")
    val w = math.max(upper - lower, 1L)
    val lBinned = left
      .withColumn("__bin", explode(array_distinct(array(
        floorDiv(col(leftOn) + lower, w), floorDiv(col(leftOn) + upper, w)))))
    val rBinned = right.withColumn("__bin", floorDiv(col(rightOn), w))
    lBinned.join(rBinned, Seq("__bin") ++ keys)
      .filter(col(rightOn) >= col(leftOn) + lower &&
        col(rightOn) <= col(leftOn) + upper)
      .drop("__bin")
  }
}
