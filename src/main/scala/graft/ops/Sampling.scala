package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: given per-stratum
  * target rates, tag each row keep/drop by a pure function of its id —
  * no RNG, so the sample is identical on every run, every executor
  * count, and every retry (the property that matters when a 100 TB
  * corpus is sampled incrementally: a re-run must not change which
  * documents are in the training set).
  *
  * `sampleBy` ships this semantics with a seeded RNG; the modulo form
  * keeps the kept set stable under appends (a new document's fate
  * depends only on its own id, not on how many rows preceded it).
  */
object Sampling {

  /** keep-predicate: rows whose `idCol % outOf` falls under their
    * stratum's rate. `rates` maps stratum value → kept residues
    * (0..outOf); missing strata use `defaultRate`. */
  def stratifiedKeep(strataCol: Column, idCol: Column,
      rates: Map[String, Int], defaultRate: Int, outOf: Int = 10): Column = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(strataCol === k, lit(r)).otherwise(acc)
    }
    pmod(idCol, lit(outOf)) < rate
  }

  /** Materialize the mixed sample: input rows tagged with `keep`. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Int], defaultRate: Int, outOf: Int = 10): DataFrame =
    df.withColumn("keep",
      stratifiedKeep(col(strataCol), col(idCol), rates, defaultRate, outOf))

  /** Token-budget sampling — the other half of training-data mixing:
    * where [[stratifiedSample]] keeps a RATE per stratum, this keeps
    * documents per stratum (in deterministic `orderCol` order) until a
    * TOKEN budget is exhausted — "2 B tokens of source X, 500 M of Y"
    * is how mixtures are actually specified. Deterministic like
    * stratifiedSample: a document's fate depends only on the documents
    * ordered before it within its stratum, so re-runs reproduce the
    * mixture exactly.
    *
    * One window (cumulative sum partitioned by stratum) = one shuffle
    * on the stratum key. Strata counts are small (sources, languages)
    * while strata can be huge — at 100 TB a single-stratum window
    * serializes that stratum through one task chain, the inherent cost
    * of an order-dependent budget; if order doesn't matter, cap by
    * [[stratifiedSample]] rate instead. */
  def tokenBudgetKeep(df: DataFrame, strataCol: String, orderCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(orderCol))
    df.withColumn("__nt", tokenCount.cast("long"))
      .withColumn("__cum", sum(col("__nt")).over(w))
      .withColumn("keep", col("__cum") <= budget)
  }

  /** Temperature-flattened mixture shares — the third leg of mixture
    * specification after rate ([[stratifiedSample]]) and budget
    * ([[tokenBudgetKeep]]): given the corpus's OBSERVED per-stratum
    * token mass p_s, the training mixture samples stratum s in
    * proportion to p_s^alpha (alpha < 1 flattens the head toward
    * uniform — the standard multilingual re-balancing; alpha = 1 is
    * natural, alpha = 0 uniform), normalized over strata. Output is
    * the stratum relation (n_docs, n_tokens, p_raw, mix_share);
    * turning a share into keep-decisions is then a rate or budget per
    * stratum via the other two ops.
    *
    * Scale shape: one map-side-combinable aggregate over the corpus
    * (|strata| rows out), then two broadcast scalar joins — the
    * corpus shuffles nothing but the partial-agg rows. Determinism:
    * token masses are exact longs; alpha = 0.5 uses IEEE sqrt
    * (exactly rounded, engine-identical); the |strata|-sized
    * normalizer sums DECIMAL(28,18)-cast terms so addition order
    * cannot change the result. */
  def temperatureMix(df: DataFrame, strataCol: String, tokenCount: Column,
      alpha: Double = 0.5): DataFrame = {
    val strata = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
    val tot = strata.agg(sum(col("n_tokens")).as("__tt"))
    def flat(p: Column): Column =
      if (alpha == 0.5) sqrt(p) else pow(p, lit(alpha))
    val withP = strata.crossJoin(broadcast(tot))
      .withColumn("p_raw", col("n_tokens").cast("double") / col("__tt"))
      .withColumn("__f", flat(col("p_raw")))
    val z = withP.agg(sum(col("__f").cast("decimal(28,18)")).as("__z"))
    withP.crossJoin(broadcast(z))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        round(col("p_raw"), 6).as("p_raw"),
        round(col("__f") / col("__z").cast("double"), 6).as("mix_share"))
  }
}
