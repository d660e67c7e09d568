package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every document by the log-likelihood ratio of its n-gram
  * features under a TARGET domain's unigram-of-bigrams model vs the
  * raw corpus's — documents that "read like" the target score high
  * and are kept for the training mixture.
  *
  * Two feature modes share one code path:
  *  - `numBuckets = None`: raw bigram strings are the features. The
  *    per-feature stat relation is vocabulary-sized, so the doc→stat
  *    join shuffles on the feature key. Exact; the oracle gate runs
  *    this mode.
  *  - `numBuckets = Some(b)`: features hash into `b` buckets
  *    (xxhash64 → pmod — the paper's hashed n-gram compression).
  *    The stat relation collapses to ≤ b rows and BROADCASTS, so at
  *    100 TB the corpus is shuffled exactly once — on the doc id,
  *    with map-side partial aggregation collapsing bigram rows to
  *    per-doc partial sums before the exchange. This is the scale
  *    mode; the gate's raw mode is its semantics oracle.
  *
  * Both per-feature probabilities are add-α smoothed over the shared
  * feature vocabulary V: p̂(f) = (cnt(f)+α)/(N+α·|V|). The per-doc
  * score is Σ over bigram OCCURRENCES of log2(p̂_target/p̂_raw) —
  * summation order varies with partitioning, so gates round the
  * score (the t19 discipline).
  */
object Dsir {

  /** Per-doc importance scores: (id, score double, n_bigrams long).
    * Docs with no bigrams (< 2 tokens) are ABSENT from the output —
    * they contribute no feature occurrences, so callers that need a
    * row per document must left-outer-join and coalesce(score, 0)
    * (the t21 query does exactly this; DsirSpec pins the absence).
    *
    * `targetPred` marks the target-domain rows (evaluated on `docs`'
    * columns); a null predicate row counts as non-target. An empty
    * target is well-defined (uniform p̂_target = 1/|V| after
    * smoothing), not an error.
    */
  def scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      alpha: Double = 0.5,
      numBuckets: Option[Int] = None): DataFrame = {
    // small-file inputs arrive as one partition; the bigram explode is
    // CPU-bound per row, so spread the corpus first (the minhashPairs
    // discipline)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val base = docs.repartition(par).select(
      col(idCol).cast("long").as("id"),
      coalesce(targetPred, lit(false)).as("tgt"),
      col(textCol).as("__text"))

    val feature = numBuckets match {
      case Some(b) => pmod(xxhash64(col("__f")), lit(b.toLong)).cast("string")
      case None    => col("__f")
    }
    val bg = base
      .select(col("id"), col("tgt"),
        explode(TextAnalysis.bigrams(col("__text"))).as("__f"))
      .select(col("id"), col("tgt"), feature.as("f"))

    // one pass produces BOTH count columns (raw = every occurrence,
    // target = occurrences inside target docs)
    val stats = bg.groupBy(col("f")).agg(
      count(lit(1)).as("cr"),
      count(when(col("tgt"), 1)).as("ct"))
    val tot = stats.agg(
      sum(col("cr")).cast("long").as("nr"),
      sum(col("ct")).cast("long").as("nt"),
      count(lit(1)).as("v"))

    val statsSide = if (numBuckets.isDefined) broadcast(stats) else stats
    val lr = log2(
      ((col("ct") + lit(alpha)) / (col("nt") + lit(alpha) * col("v"))) /
        ((col("cr") + lit(alpha)) / (col("nr") + lit(alpha) * col("v"))))
    bg.join(statsSide, Seq("f"))
      .crossJoin(broadcast(tot))
      .groupBy(col("id"))
      .agg(sum(lr).as("score"), count(lit(1)).as("n_bigrams"))
  }

  /** Corpus-level distribution-shift report: per `groupCol` stratum,
    * the KL-style divergence of the stratum's token-unigram
    * distribution from the TARGET sub-corpus's, truncated to the
    * stratum's observed support (the terms for words the stratum
    * never emits are each a vanishing α-mass contribution; the
    * truncated sum is the standard corpus-report approximation and
    * keeps the computation one pass over observed (stratum, word)
    * pairs instead of |strata|×|V|). Both distributions are add-α
    * smoothed over the shared corpus vocabulary V, so the metric is
    * comparable across strata of different sizes.
    *
    * Returns (group, n_tokens, divergence double — unrounded; gates
    * round). Scale shape: the corpus is tokenized/exploded ONCE and
    * shuffled once, on the (stratum, word) key, carrying both the
    * stratum count and the target-occurrence count; the target-word
    * relation derives by re-aggregating that vocab×strata-bounded
    * result (persisted for the query's scope — it is metadata-sized
    * next to the corpus, and deriving it from the corpus again would
    * re-run the explode per consumer), per-stratum totals broadcast
    * back, and the final rollup is |strata|-sized.
    */
  def divergence(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      targetPred: Column,
      alpha: Double = 0.5): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val tk = docs.repartition(par).select(
        col(groupCol).as("g"),
        coalesce(targetPred, lit(false)).as("tgt"),
        col(textCol).as("__text"))
      .select(col("g"), col("tgt"),
        explode(TextAnalysis.tokens(col("__text"))).as("w"))

    // ONE pass over the corpus: (g, w) carries the stratum count AND
    // the target-occurrence count, so tw/totG/tot all derive from
    // this vocab×strata-bounded relation instead of re-exploding
    val sw = tk.groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("cs"), count(when(col("tgt"), 1)).as("cst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tw = sw.groupBy(col("w")).agg(sum(col("cst")).cast("long").as("ct"))
    val totG = sw.groupBy(col("g")).agg(sum(col("cs")).cast("long").as("ns"))
    val tot = tw.agg(sum(col("ct")).cast("long").as("nt"),
      count(lit(1)).as("v"))

    val ps = (col("cs") + lit(alpha)) / (col("ns") + lit(alpha) * col("v"))
    val pt = (col("ct") + lit(alpha)) / (col("nt") + lit(alpha) * col("v"))
    val out = sw.join(tw, Seq("w"))
      .join(broadcast(totG), Seq("g"))
      .crossJoin(broadcast(tot))
      .withColumn("term", ps * log2(ps / pt))
      .groupBy(col("g"))
      .agg(max(col("ns")).as("n_tokens"), sum(col("term")).as("divergence"))
      // |strata|-sized — eagerly materialized so the shared (g, w)
      // aggregate can be released here rather than leaking executor
      // storage across invocations in a long-lived driver
      .localCheckpoint(true)
    sw.unpersist()
    out
  }
}
