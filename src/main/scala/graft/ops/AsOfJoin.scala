package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join, the operator Spark lacks natively.
  *
  * For each left row, attaches the right row with the greatest `rightOn`
  * value ≤ (or < when `strict`) the left row's `leftOn`, within matching
  * `by` keys. Implemented Spark-first as union + running-max window:
  * ONE shuffle on the `by` keys, no per-key driver loops, no range
  * cross-join blowup — at 100 TB both inputs shuffle once and each
  * partition is processed with a single ordered pass (sort-based
  * window), so skew/AQE handling applies as usual.
  *
  * Right payload columns ride along inside a struct whose first field is
  * the ordering key, so `max` picks the latest-by-time row (ties broken
  * by the payload fields' own ordering, deterministically).
  */
object AsOfJoin {

  /** Forward as-of join: for each left row, the right row with the
    * smallest `rightOn` ≥ (or > when `strict`) the left's `leftOn`.
    * Same single-shuffle union+window shape as [[backward]]. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftOn: String,
      rightOn: String,
      rightPayload: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      (by.map(col) :+ col(rightOn).as(leftOn)) ++ rightPayload.map(col): _*)
      .withColumn("__side", lit(1))
    val lTagged = left.withColumn("__side", lit(0))
    val combined = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val lower = if (strict) 1L else 0L
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(leftOn))
      .rangeBetween(lower, Window.unboundedFollowing)
    val asofStruct = min(when(col("__side") === 1,
      struct((col(leftOn).as("__on") +: rightPayload.map(col)): _*))).over(w)

    val outCols = leftCols.map(col) ++
      (col("__asof.__on").as(s"asof_$rightOn") +:
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c")))
    combined
      .withColumn("__asof", asofStruct)
      .filter(col("__side") === 0)
      .select(outCols: _*)
  }

  def backward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftOn: String,
      rightOn: String,
      rightPayload: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      (by.map(col) :+ col(rightOn).as(leftOn)) ++ rightPayload.map(col): _*)
      .withColumn("__side", lit(1))
    val lTagged = left.withColumn("__side", lit(0))
    val combined = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val upper = if (strict) -1L else 0L
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(leftOn))
      .rangeBetween(Window.unboundedPreceding, upper)
    val asofStruct = max(when(col("__side") === 1,
      struct((col(leftOn).as("__on") +: rightPayload.map(col)): _*))).over(w)

    val outCols = leftCols.map(col) ++
      (col("__asof.__on").as(s"asof_$rightOn") +:
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c")))
    combined
      .withColumn("__asof", asofStruct)
      .filter(col("__side") === 0)
      .select(outCols: _*)
  }

  /** Nearest as-of join: for each left row, the right row whose
    * `rightOn` is CLOSEST in either direction (pandas
    * `merge_asof(direction='nearest')` distance semantics), ties
    * broken backward (earlier right row wins). Both candidate
    * frames — running max over (-inf, 0] and running min over
    * [0, +inf) — share one partitioning AND ordering, so Catalyst
    * evaluates them over a single shuffle + sort; the pick is a
    * per-row comparison. Equal timestamps count as distance 0 (RANGE
    * frames include peers).
    *
    * Payload tie convention among DUPLICATE right timestamps: the
    * backward candidate resolves by max payload struct (largest
    * payload wins — the same rule [[backward]] documents), the
    * forward candidate by min (smallest wins) — each frame's
    * aggregate orders (timestamp, payload…) lexicographically, and
    * inverting the payload order inside one frame would need a
    * type-specific negation. Both differ from pandas, which takes
    * the LAST right row in input order (an order a shuffled relation
    * doesn't have). With `rightPayload` empty — the attribution
    * shape q64 gates — duplicate timestamps are indistinguishable
    * and the convention is unobservable. */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftOn: String,
      rightOn: String,
      rightPayload: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      (by.map(col) :+ col(rightOn).as(leftOn)) ++ rightPayload.map(col): _*)
      .withColumn("__side", lit(1))
    val lTagged = left.withColumn("__side", lit(0))
    val combined = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val rStruct = when(col("__side") === 1,
      struct((col(leftOn).as("__on") +: rightPayload.map(col)): _*))
    val wBack = Window.partitionBy(by.map(col): _*).orderBy(col(leftOn))
      .rangeBetween(Window.unboundedPreceding, 0L)
    val wFwd = Window.partitionBy(by.map(col): _*).orderBy(col(leftOn))
      .rangeBetween(0L, Window.unboundedFollowing)

    val picked = combined
      .withColumn("__b", max(rStruct).over(wBack))
      .withColumn("__f", min(rStruct).over(wFwd))
      .filter(col("__side") === 0)
      .withColumn("__n",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(col(leftOn) - col("__b.__on") <= col("__f.__on") - col(leftOn),
            col("__b"))
          .otherwise(col("__f")))

    val outCols = leftCols.map(col) ++
      (col("__n.__on").as(s"nearest_$rightOn") +:
        rightPayload.map(c => col(s"__n.$c").as(s"nearest_$c")))
    picked.select(outCols: _*)
  }
}
