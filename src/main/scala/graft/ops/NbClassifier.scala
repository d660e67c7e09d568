package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive-Bayes quality/domain classifier — the
  * classifier-based filtering stage (GPT-3 / CCNet / PaLM reports):
  * train a generative two-class token model on weak labels (target
  * domain vs rest), then score every document by the class
  * log-posterior ratio and KEEP the ones that "read like" the target.
  *
  * vs [[Dsir]] (the importance-RESAMPLING leg): DSIR produces
  * per-document sampling weights against the raw-corpus distribution
  * (no priors, bigram features, no decision); this is the hard-filter
  * leg — unigram multinomial likelihoods, class priors, and a binary
  * keep decision at log-odds 0. The two compose in p01-style builds:
  * classifier gate first, importance weights on the survivors.
  *
  * Model (add-one / Laplace over the shared vocabulary V):
  *   theta(t|c) = (count(t,c) + 1) / (N_c + |V|)
  *   score(d)   = ln P(tgt)/P(¬tgt) + Σ_t tf(d,t)·ln theta(t|tgt)/theta(t|¬tgt)
  *
  * Cross-engine determinism (the t23/p04 discipline): every ln — the
  * only libm call — rounds to 6 up front; per-term contributions and
  * the prior are exact-rational-factor products cast to
  * DECIMAL(28,18) and summed as decimals, so partitioning can never
  * reorder a float sum; the final score rounds to 6 for gates.
  *
  * Scale shape: one scan tokenizes the corpus; the (doc, term) tf
  * relation and the V-sized model BOTH derive from that exploded
  * relation (one exchange under both), the two O(1)-row stat
  * aggregates broadcast, and scoring is an equi-join on the term key
  * with map-side-combined per-doc partial sums. When V itself is too
  * large to shuffle comfortably, `numBuckets` switches to hashed
  * features (pmod(xxhash64) — the [[Dsir]] mode): the model collapses
  * to ≤ b rows and BROADCASTS, so no exchange ever carries a V-sized
  * relation — both remaining shuffles ((id, feature) tf compression,
  * then the per-doc rollup) are document-bounded.
  */
object NbClassifier {

  /** Per-doc classifier scores: (id, n_tokens long, nb_score double
    * round-6, keep boolean = nb_score > 0). Every input row gets an
    * output row: a doc whose text is a single empty token still
    * carries that token through the model (split(" ") never yields an
    * empty array), and a NULL text contributes no token occurrences —
    * it scores as the prior alone, with null n_tokens (honest: length
    * undefined, prior is all the model knows). `targetPred` marks
    * target-domain rows; null evaluates as non-target. Degenerate
    * labelings (all-target / none-target) make a prior term
    * ln(0) = -inf by the model's own math; the ±Infinity double
    * prior then casts to DECIMAL(28,18), which Spark maps to NULL in
    * non-ANSI mode — so a corpus that cannot train a two-class model
    * surfaces as NULL nb_score/keep on every row, never as a
    * plausible finite score. */
  def scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      numBuckets: Option[Int] = None): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val base = docs.repartition(par).select(
      col(idCol).cast("long").as("id"),
      coalesce(targetPred, lit(false)).as("tgt"),
      TextAnalysis.tokens(col(textCol)).as("__t"))

    // hashed-feature mode (the Dsir trick): terms collapse into <= b
    // buckets, so the model relation BROADCASTS and no exchange ever
    // carries a V-sized relation — the 100 TB shape when V outgrows
    // a comfortable term-keyed shuffle. Raw mode is its oracle.
    val feature = numBuckets match {
      case Some(b) => pmod(xxhash64(col("__w")), lit(b.toLong)).cast("string")
      case None    => col("__w")
    }
    val tok = base
      .select(col("id"), col("tgt"), explode(col("__t")).as("__w"))
      .select(col("id"), col("tgt"), feature.as("term"))

    // scoring relation: per-(doc, term) tf
    val dtf = tok.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // model: V rows of per-class occurrence counts
    val model = tok.groupBy(col("term")).agg(
      count(when(col("tgt"), 1)).as("c_tgt"),
      count(lit(1)).as("c_all"))
    // O(1)-row stats: class token totals + vocab size; doc priors
    val tokStats = model.agg(
      sum(col("c_tgt")).cast("long").as("n_tgt"),
      (sum(col("c_all")) - sum(col("c_tgt"))).cast("long").as("n_oth"),
      count(lit(1)).as("v"))
    val docStats = base.agg(
      count(when(col("tgt"), 1)).as("nd_tgt"),
      count(lit(1)).as("nd_all"))

    // per-occurrence weight: tf × (round-6 ln-ratio), exact product,
    // decimal-cast so the per-doc sum is order-insensitive
    val w =
      round(log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + col("v"))), 6) -
        round(log((col("c_all") - col("c_tgt") + lit(1.0)) /
          (col("n_oth") + col("v"))), 6)
    val modelSide = if (numBuckets.isDefined) broadcast(model) else model
    val contrib = dtf.join(modelSide, Seq("term"))
      .crossJoin(broadcast(tokStats))
      .select(col("id"), (col("tf") * w).cast("decimal(28,18)").as("c"))
    val scored = contrib.groupBy(col("id")).agg(sum(col("c")).as("sc"))

    val prior =
      (round(log(col("nd_tgt").cast("double") / col("nd_all")), 6) -
        round(log((col("nd_all") - col("nd_tgt")).cast("double") /
          col("nd_all")), 6)).cast("decimal(28,18)")
    base.select(col("id"), size(col("__t")).cast("long").as("n_tokens"))
      .join(scored, Seq("id"), "left_outer")
      .crossJoin(broadcast(docStats))
      .select(col("id"), col("n_tokens"),
        round((coalesce(col("sc"), lit(0).cast("decimal(28,18)")) + prior)
          .cast("double"), 6).as("nb_score"))
      .withColumn("keep", col("nb_score") > 0)
  }

  // ---- persisted model (train once, score any later batch/stream) ----
  //
  // [[scores]] is the one-pass self-scoring convenience the oracle
  // gates; the deployment shape trains on a curated corpus and scores
  // INCOMING documents against the stored model — the same
  // train-time/serve-time split the vector index (s14) and near-dup
  // index (d19) persist. The model is two exact-integer relations
  // (per-term class counts; one stats row carrying class totals,
  // vocab size, doc priors, and the feature mode), so persistence
  // round-trips bit-for-bit and a loaded model scores exactly what
  // the in-memory one would — NbClassifierSpec gates
  // scoreWith(load(save(train(c))), c) == scores(c) as literal row
  // equality.

  /** Train the model: `terms` (term, c_tgt, c_all — V rows, ≤ b in
    * hashed mode) and `stats` (n_tgt, n_oth, v, nd_tgt, nd_all,
    * n_buckets; -1 = raw terms). */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      numBuckets: Option[Int] = None): (DataFrame, DataFrame) = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val base = docs.repartition(par).select(
      col(idCol).cast("long").as("id"),
      coalesce(targetPred, lit(false)).as("tgt"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
    val feature = numBuckets match {
      case Some(b) => pmod(xxhash64(col("__w")), lit(b.toLong)).cast("string")
      case None    => col("__w")
    }
    val tok = base
      .select(col("id"), col("tgt"), explode(col("__t")).as("__w"))
      .select(col("id"), col("tgt"), feature.as("term"))
    val terms = tok.groupBy(col("term")).agg(
      count(when(col("tgt"), 1)).as("c_tgt"),
      count(lit(1)).as("c_all"))
    val stats = terms.agg(
        sum(col("c_tgt")).cast("long").as("n_tgt"),
        (sum(col("c_all")) - sum(col("c_tgt"))).cast("long").as("n_oth"),
        count(lit(1)).as("v"))
      .crossJoin(base.agg(
        count(when(col("tgt"), 1)).as("nd_tgt"),
        count(lit(1)).as("nd_all")))
      .withColumn("n_buckets", lit(numBuckets.map(_.toLong).getOrElse(-1L)))
    (terms, stats)
  }

  def save(model: (DataFrame, DataFrame), dir: String): Unit = {
    model._1.write.mode("overwrite").parquet(s"$dir/terms")
    model._2.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/terms"), spark.read.parquet(s"$dir/stats"))

  /** Incrementally maintain a trained model from a change feed — the
    * c18/c19 IVM discipline applied to the classifier: NB sufficient
    * statistics are pure integer counts, so inserts ADD and deletes
    * SUBTRACT exactly and the delta-maintained model must equal a
    * from-scratch retrain on the post-change corpus BIT-FOR-BIT
    * (c23 gates exactly that; no approximation, no drift). The cost
    * is delta-sized: one tokenize pass over `changes`, a V-vs-|Δ|
    * outer join on the term key, and a V-sized stats re-aggregate —
    * never a corpus rescan, the same economics as s16's index append.
    *
    * `opCol` marks each change row 'D' (delete; its text must equal
    * the originally-inserted text — the caller's change feed carries
    * before-images, as CDC deletes do) or anything else = insert.
    * Terms whose occurrence count reaches 0 leave the relation, so
    * vocabulary size V matches the retrain. The feature-bucketing
    * mode is read from the model's own stats row — a delta cannot
    * bucket differently than its trainer. */
  def applyDelta(
      model: (DataFrame, DataFrame),
      changes: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      opCol: Column): (DataFrame, DataFrame) = {
    val (terms, stats) = model
    val nBuckets = stats.select(col("n_buckets")).head().getLong(0)
    val feature =
      if (nBuckets >= 0) pmod(xxhash64(col("__w")), lit(nBuckets)).cast("string")
      else col("__w")
    val par = changes.sparkSession.sparkContext.defaultParallelism
    val base = changes.repartition(par).select(
      col(idCol).cast("long").as("id"),
      coalesce(targetPred, lit(false)).as("tgt"),
      (when(opCol === "D", -1L).otherwise(1L)).as("sign"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
    val dTerms = base
      .select(col("tgt"), col("sign"), explode(col("__t")).as("__w"))
      .select(col("tgt"), col("sign"), feature.as("term"))
      .groupBy(col("term")).agg(
        sum(when(col("tgt"), col("sign")).otherwise(0L)).as("d_tgt"),
        sum(col("sign")).as("d_all"))
    val newTerms = terms.join(dTerms, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("c_tgt"), lit(0L)) + coalesce(col("d_tgt"), lit(0L)))
          .as("c_tgt"),
        (coalesce(col("c_all"), lit(0L)) + coalesce(col("d_all"), lit(0L)))
          .as("c_all"))
      .filter(col("c_all") > 0)
    // coalesce: an EMPTY change feed sums to null, and a null delta
    // would null the carried doc priors
    val dDocs = base.agg(
      coalesce(sum(when(col("tgt"), col("sign")).otherwise(0L)), lit(0L))
        .as("dd_tgt"),
      coalesce(sum(col("sign")), lit(0L)).as("dd_all"))
    val newStats = newTerms.agg(
        coalesce(sum(col("c_tgt")), lit(0L)).cast("long").as("n_tgt"),
        coalesce(sum(col("c_all")) - sum(col("c_tgt")), lit(0L))
          .cast("long").as("n_oth"),
        count(lit(1)).as("v"))
      .crossJoin(
        stats.select(col("nd_tgt"), col("nd_all"), col("n_buckets"))
          .crossJoin(broadcast(dDocs))
          .select((col("nd_tgt") + col("dd_tgt")).as("nd_tgt"),
            (col("nd_all") + col("dd_all")).as("nd_all"),
            col("n_buckets")))
    (newTerms, newStats)
  }

  /** Score any document batch against a trained model. Unlike
    * [[scores]]' self-scoring join, tokens UNSEEN at training time
    * are real here (new documents, new vocabulary) and get the
    * model's own smoothed zero-count weight via a left join with
    * counts coalesced to 0 — on the training corpus itself every
    * term matches, so this path reproduces [[scores]] exactly. */
  def scoreWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: (DataFrame, DataFrame)): DataFrame = {
    val (terms, stats) = model
    val spark = docs.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val st = broadcast(stats)
    // feature mode travels WITH the model — a scorer cannot drift
    // from its trainer's bucketing
    val nBuckets = stats.select(col("n_buckets")).head().getLong(0)
    val feature =
      if (nBuckets >= 0) pmod(xxhash64(col("__w")), lit(nBuckets)).cast("string")
      else col("__w")
    val base = docs.repartition(par).select(
      col(idCol).cast("long").as("id"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
    val dtf = base
      .select(col("id"), explode(col("__t")).as("__w"))
      .select(col("id"), feature.as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val termSide = if (nBuckets >= 0) broadcast(terms) else terms
    val w =
      round(log((coalesce(col("c_tgt"), lit(0L)) + lit(1.0)) /
        (col("n_tgt") + col("v"))), 6) -
        round(log((coalesce(col("c_all"), lit(0L)) -
          coalesce(col("c_tgt"), lit(0L)) + lit(1.0)) /
          (col("n_oth") + col("v"))), 6)
    val contrib = dtf.join(termSide, Seq("term"), "left_outer")
      .crossJoin(st)
      .select(col("id"), (col("tf") * w).cast("decimal(28,18)").as("c"))
    val scored = contrib.groupBy(col("id")).agg(sum(col("c")).as("sc"))
    val prior =
      (round(log(col("nd_tgt").cast("double") / col("nd_all")), 6) -
        round(log((col("nd_all") - col("nd_tgt")).cast("double") /
          col("nd_all")), 6)).cast("decimal(28,18)")
    base.select(col("id"), size(col("__t")).cast("long").as("n_tokens"))
      .join(scored, Seq("id"), "left_outer")
      .crossJoin(st)
      .select(col("id"), col("n_tokens"),
        round((coalesce(col("sc"), lit(0).cast("decimal(28,18)")) + prior)
          .cast("double"), 6).as("nb_score"))
      .withColumn("keep", col("nb_score") > 0)
  }
}
