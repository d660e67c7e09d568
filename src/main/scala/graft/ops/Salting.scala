package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins that can't broadcast: salt the skewed
  * (big) side deterministically and replicate the small side across
  * the salt domain, so one hot key spreads over `n` reducers instead
  * of melting a single one. AQE's skew-join handles sort-merge splits
  * automatically; this is the explicit tool for the cases AQE can't
  * see (e.g. repeated aggregate-join pipelines or storage-partitioned
  * inputs).
  *
  * Determinism: the salt comes from hashing a caller-chosen expression
  * of the big row (not rand()), so replays and retries produce
  * identical partitioning.
  */
object Salting {

  /** Inner-join `big` with `small` on bigKey == smallKey, spreading
    * each big-side key over `n` salt values derived from `saltFrom`. */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltFrom: Column, n: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(saltFrom), lit(n)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
