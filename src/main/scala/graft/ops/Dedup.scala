package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, all expressed
  * as declarative DataFrame transforms:
  *
  *  - exact dedup: hash-group / window keep-first
  *  - MinHash + LSH: shingle → signature → banded bucket join →
  *    exact-Jaccard verification (the only pairwise work happens
  *    inside LSH buckets, never across the full corpus)
  *  - SimHash: 32-bit sign-aggregated token hashes, hamming distance
  *  - n-gram Jaccard within blocking keys
  *
  * Scale: signatures/fingerprints are per-row expression trees
  * (codegen, no shuffle); candidate generation shuffles by band
  * bucket — cardinality ≈ docs × bands, each tiny; verification joins
  * only the deduped candidate id-pairs back to shingle sets. No step
  * is quadratic in corpus size unless the data itself collides
  * (tunable via bands/rows).
  */
object Dedup {

  // ---- exact ----

  /** Keep one row per key (the first by `tieBreak`), tagging it with
    * the duplicate count. */
  def exactDedup(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    // the count shares w's partitioning AND ordering (full frame), so
    // Catalyst plans ONE Window operator over one sort — not a second
    // window pass alongside the row_number
    df.withColumn("__rn", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ---- shingling ----

  /** Distinct k-token shingles of whitespace-tokenized text. Documents
    * shorter than k tokens yield an EMPTY set (no whole-text fallback):
    * the SQL-oracle formulation (`range`-based shingling) produces an
    * empty list for them, so a fallback here would silently pair short
    * docs the oracle never sees. Short docs therefore never join any
    * near-dup pair — callers wanting exact short-doc dedup use
    * [[exactDedup]] on the raw text. */
  def shingleSet(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    array_distinct(when(n >= k,
      transform(sequence(lit(0), n - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))))
  }

  /** Shingle set hashed to distinct longs: set operations over
    * primitive arrays skip per-pair string hashing/allocation, and a
    * 64-bit collision (~1e-19 per pair) is the only semantic delta. */
  def hashedShingleSet(text: Column, k: Int = 3): Column =
    array_distinct(transform(shingleSet(text, k), sh => xxhash64(sh)))

  /** Exact Jaccard over two distinct-element arrays. One intersection
    * only: |A∪B| = |A|+|B|-|A∩B| (array_intersect is O(|A|·|B|); the
    * union would double the pairwise work). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - inter
    // two empty sets: NULL (excluded by any >= filter), matching SQL
    // division-by-zero semantics rather than NaN/ANSI-error
    inter / when(union =!= 0, union)
  }

  /** Cheap necessary condition for jaccard(a,b) >= t: set sizes within
    * ratio t of each other. Applied before any O(|A|·|B|) work. */
  def sizeCompatible(a: Column, b: Column, t: Double): Column =
    size(a) >= size(b) * t && size(b) >= size(a) * t

  // ---- MinHash + LSH ----

  /** Rotate-xor combine (bitwise-only: no ANSI overflow checks). */
  private def rotXor(acc: Column, x: Column): Column =
    shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(x)

  /** MinHash signatures as a DataFrame: (id, blockCols…, sig) where
    * `sig` is the array<long> of all slot minima, computed by the
    * fused codegen expression [[graft.functions.MinHashSignature]] —
    * one shuffle-free narrow projection with a constant-size plan.
    * (Both declarative alternatives lose badly: explode + n min
    * aggregates shuffles |corpus|×|shingles| rows, and n-wide
    * `array_min(transform(...))` trees are interpreted AND stall every
    * action's Catalyst re-optimization pass.) Rows with empty shingle
    * sets are dropped (they can pair with nothing; a shared null
    * signature would collide all short docs into one band bucket).
    */
  def minhashSignatures(sets: DataFrame, numHashes: Int,
      blockCols: Seq[String] = Nil): DataFrame =
    sets.select((col("id") +: blockCols.map(col)) :+
        graft.functions.MinHash.signature(col("sh"), numHashes).as("sig"): _*)
  // NOTE deliberately no `.filter(sig.isNotNull)` here: a filter on the
  // expression result is pushed below the caller's repartition and
  // re-evaluates the whole interpreted shingle pipeline single-threaded
  // at the (often 1-partition) scan — callers pre-filter empty shingle
  // sets on a cheap source column instead (see minhashPairs).

  /** LSH band-bucket rows (id, blockCols…, band, bucket) from a
    * signature relation: each band's slot minima fold into one bucket
    * key via rotate-xor. Shared by the batch pair join
    * ([[minhashPairs]]) and the streaming candidate detector
    * (d18) so both sides bucket IDENTICALLY — a per-row narrow
    * projection + one bounded (×bands) generator, no shuffle. */
  def bandBucketRows(sig: DataFrame, numHashes: Int, bands: Int,
      blockCols: Seq[String] = Nil): DataFrame = {
    val rowsPer = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      (0 until rowsPer).map(r => element_at(col("sig"), b * rowsPer + r + 1))
        .foldLeft(lit(1125899906842597L): Column)(rotXor).as(s"b$b")
    }
    sig.select((col("id") +: blockCols.map(col)) ++ bandCols: _*)
      .select((col("id") +: blockCols.map(col)) :+
        posexplode(array((0 until bands).map(b => col(s"b$b")): _*))
          .as(Seq("band", "bucket")): _*)
  }

  /** Near-duplicate pairs by MinHash LSH, verified by exact Jaccard.
    * Returns (a, b, jaccard) with a < b and jaccard >= threshold.
    *
    * `blockCols` restricts pairs to rows agreeing on every block
    * column (the band-bucket join key gains the blocks) — the
    * LSH-within-block shape that replaces an all-pairs scan inside
    * blocks: block skew no longer matters because pairwise work only
    * happens inside (block × band-bucket) cells.
    *
    * Tune `bands` to the threshold: the probability a true pair is
    * missed is (1 - t^(numHashes/bands))^bands — 64/16 for t≈0.8,
    * 64/32 for t≈0.5.
    *
    * Nothing is persisted: signatures consume the shingle relation in
    * one pass, and verification re-shingles only candidate rows (the
    * shingling expression sits ABOVE the candidate join, so Catalyst
    * evaluates it per matched row, not per corpus row — cheaper than
    * caching the full shingle relation at 100 TB and leak-free in a
    * long-lived session).
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      blockCols: Seq[String] = Nil): DataFrame = {
    // small-file inputs arrive as one partition; per-row shingle/hash
    // work is CPU-bound, so spread it across the cluster first
    val par = df.sparkSession.sparkContext.defaultParallelism
    // docs with < k tokens shingle to the empty set and can pair with
    // nothing — pruned on the raw token count (cheap, pushable to the
    // scan) so no null signatures reach the band buckets
    val base = df.filter(size(split(col(textCol), " ")) >= k)
      .repartition(par).select(
        (col(idCol).cast("long").as("id") +: blockCols.map(col)) :+
          col(textCol).as("__text"): _*)
    val sets = base.select(
      (col("id") +: blockCols.map(col)) :+
        hashedShingleSet(col("__text"), k).as("sh"): _*)
    val sig = minhashSignatures(sets, numHashes, blockCols)
    val banded = bandBucketRows(sig, numHashes, bands, blockCols)
    // candidates by ONE aggregation per (block × band × bucket) cell +
    // in-bucket pair expansion — a banded self-join would shuffle AND
    // recompute the whole signature pipeline twice; this shuffles the
    // (id, band, bucket) relation once. The expansion is TWO chained
    // generators, not one flattened m²/2-struct array: a heavy
    // exact-dup cluster shares every band bucket, so a single-row
    // expansion is unbounded per-row memory (executor OOM at 100 TB
    // skew), while chained explodes keep per-row state at O(m) — the
    // membership array — and stream the m²/2 output pairs. (The PAIR
    // COUNT for a giant mutual-dup bucket is inherently quadratic —
    // that is the operator's contract — but it flows through shuffle
    // spill instead of living in one row's eval buffer.)
    val candidates = bucketCandidates(banded, blockCols)
    candidates
      .join(base.select(col("id").as("a"), col("__text").as("__ta")), "a")
      .join(base.select(col("id").as("b"), col("__text").as("__tb")), "b")
      .withColumn("sha", hashedShingleSet(col("__ta"), k))
      .withColumn("shb", hashedShingleSet(col("__tb"), k))
      .filter(sizeCompatible(col("sha"), col("shb"), threshold))
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-document near-dup DEGREE — the COUNT-ONLY form of
    * [[minhashPairs]] for dedup REPORTS at 100 TB scale: a fleet-wide
    * duplication report wants each document's partner count (or the
    * cluster-size histogram built from it), not the pair RELATION,
    * and the relation is the quadratic part — m10's 100× panel
    * measured 19.0 M materialized pairs at ~2.1 µs/pair, pure output
    * cost. Here the verified pair stream flows straight from the
    * banded join into a partially-combined hash aggregate keyed by
    * document id: map-side combine collapses the quadratic stream
    * inside each task, the only shuffled/emitted relation is O(docs
    * with a partner), and nothing pair-shaped is ever sorted, stored,
    * or returned. Returns (id, dup_degree), dup_degree >= 1. */
  def minhashDupDegrees(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      blockCols: Seq[String] = Nil): DataFrame =
    minhashPairs(df, idCol, textCol, threshold, k, numHashes, bands,
        blockCols)
      // each verified pair contributes one partner to BOTH endpoints
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dup_degree"))

  /** [[minhashDupDegrees]] derived from the PERSISTED index
    * (`buildNearDupIndex` / the d19 ingest loop's artifact) instead of
    * re-shingling the corpus — the count-only report at the 100 TB
    * operating point: stored buckets expand to candidates, stored
    * member sets verify, and the verified stream collapses map-side
    * into per-document degrees. No text touched, no pair relation
    * materialized. */
  def dupDegreesFromIndex(spark: SparkSession, dir: String,
      threshold: Double): DataFrame =
    pairsFromIndex(spark, dir, threshold)
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dup_degree"))

  /** BIPARTITE near-dup pairs: every (left, right) pair with exact
    * Jaccard >= threshold — the fuzzy-decontamination shape (corpus vs
    * a benchmark/eval set), where [[minhashPairs]] over the union
    * would spend almost all its pairwise work on the corpus-internal
    * pairs the caller does not want. Returns (a = left id, b = right
    * id, jaccard); ids may collide across sides (the caller's ids are
    * namespaced by side, never compared).
    *
    * Scale shape: both sides shingle/sign/bucket through the SAME
    * kernels as [[minhashPairs]] (so banding guarantees carry over);
    * the right side is small by nature (an eval set), so its bucket
    * relation and its shingle sets BROADCAST — the corpus side stays
    * one linear pass with a broadcast-hash join per band row and no
    * corpus shuffle at all. Candidates dedup on (a, b) before the
    * exact verify; verification hits stored right-side sets and
    * re-shingles only candidate left rows (the minhashPairs
    * discipline). */
  def crossPairs(
      left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val par = left.sparkSession.sparkContext.defaultParallelism
    def prep(df: DataFrame): DataFrame =
      df.filter(size(split(col(textCol), " ")) >= k)
        .repartition(par)
        .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"))
    val lb = prep(left)
    // the small side is read twice (buckets, then stored shingle
    // sets) — pin it so neither consumer re-runs its scan
    val rb = prep(right).localCheckpoint(true)
    def banded(base: DataFrame): DataFrame =
      bandBucketRows(
        minhashSignatures(
          base.select(col("id"), hashedShingleSet(col("__text"), k).as("sh")),
          numHashes),
        numHashes, bands)
    val candidates = banded(lb)
      .join(broadcast(banded(rb).select(col("id").as("b"),
        col("band"), col("bucket"))), Seq("band", "bucket"))
      .select(col("id").as("a"), col("b"))
      .dropDuplicates("a", "b")
    candidates
      .join(lb.select(col("id").as("a"), col("__text").as("__ta")), "a")
      .join(broadcast(rb.select(col("id").as("b"),
        hashedShingleSet(col("__text"), k).as("shb"))), "b")
      .withColumn("sha", hashedShingleSet(col("__ta"), k))
      .filter(sizeCompatible(col("sha"), col("shb"), threshold))
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- persisted near-dup index (incremental corpus ingestion) ----
  //
  // minhashPairs re-derives everything per run — right for a one-shot
  // dedup report, wrong for the production ingest loop where a small
  // batch of NEW documents must be checked against a 100 TB corpus
  // that was already indexed: re-shingling the corpus per batch costs
  // a full scan each time. The index persisted here is the same two
  // relations the batch path derives in-flight, stored once:
  //
  //   members/  (id, sh)            — hashed shingle sets, so exact-
  //                                   Jaccard verification reads the
  //                                   STORED set and never re-tokenizes
  //                                   an indexed document
  //   buckets/  (id, band, bucket)  — the LSH band buckets, the join
  //                                   surface a probe hits
  //
  // Both derive via the same bandBucketRows/minhashSignatures code the
  // batch and streaming (d18) paths use, so all three disciplines
  // bucket identically and one oracle covers them.

  /** In-bucket candidate pair expansion shared by [[minhashPairs]]
    * and [[pairsFromIndex]]: one aggregation per (block × band ×
    * bucket) cell + two chained generators (see the minhashPairs
    * comment for why chained explodes, not one m²/2-struct array). */
  private def bucketCandidates(banded: DataFrame,
      blockCols: Seq[String] = Nil): DataFrame =
    banded
      .groupBy((col("band") +: col("bucket") +: blockCols.map(col)): _*)
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("a"), explode(
        slice(col("ids"), col("i") + lit(2), size(col("ids")) - col("i") - 1))
        .as("b"))
      .dropDuplicates("a", "b")

  /** All near-dup pairs WITHIN an indexed corpus, derived from the
    * stored relations alone — the shared artifact behind every
    * pair-consuming analysis (d11 cluster stats, m06 cross-modal QA,
    * d07-style canonicalization): at 100 TB the index is built once
    * ([[buildNearDupIndex]], or incrementally by the d19 ingest loop)
    * and each analysis derives pairs from `buckets/` + `members/`
    * instead of re-shingling and re-bucketing the corpus per query.
    * Output contract identical to [[minhashPairs]] ((a, b, jaccard),
    * a < b, exact jaccard >= threshold): same bucket expansion, same
    * exact-Jaccard verification — reading STORED shingle sets, so no
    * text is ever re-tokenized. */
  def pairsFromIndex(spark: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    val members = spark.read.parquet(s"$dir/members")
    bucketCandidates(spark.read.parquet(s"$dir/buckets"))
      .join(members.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(members.select(col("id").as("b"), col("sh").as("shb")), "b")
      .filter(sizeCompatible(col("sha"), col("shb"), threshold))
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-document degree in the near-dup graph plus the hub-prune
    * decision — the curation signal cluster statistics hide: a
    * template shell ("hub") pairs with MANY documents that are not
    * similar to EACH OTHER (a star, not a clique), so connected
    * components report one big cluster while the one document worth
    * dropping is the hub at its center. Degree is a map-side-
    * combinable count over the symmetrized pair relation plus a left
    * join back to the corpus (degree-0 docs kept at 0); `hubDegree`
    * is corpus-calibrated (a production pipeline pins it at a high
    * percentile of the degree distribution). At 100 TB `pairs` comes
    * from the persisted near-dup index ([[pairsFromIndex]]) so no
    * pair consumer re-shingles the corpus. */
  def nearDupDegrees(corpus: DataFrame, idCol: String, pairs: DataFrame,
      hubDegree: Long): DataFrame = {
    val deg = pairs.select(col("a").as(idCol))
      .unionAll(pairs.select(col("b").as(idCol)))
      .groupBy(col(idCol)).agg(count(lit(1)).as("degree"))
    corpus.select(col(idCol))
      .join(deg, Seq(idCol), "left_outer")
      .withColumn("degree", coalesce(col("degree"), lit(0L)))
      .withColumn("is_hub", col("degree") >= hubDegree)
  }

  /** PageRank-style centrality over the (symmetrized) near-dup graph
    * — the transitive hub signal d21's raw degree can't see: a
    * template shell that pairs with OTHER well-connected shells ranks
    * above one with the same degree into leaf documents, which is the
    * priority order a curation run prunes in. Fixed `iters` power
    * iterations, no dangling-mass redistribution (isolated docs sit
    * at (1-d)/N; the score is a relative signal, not a probability —
    * documented, standard for graph-local centrality).
    *
    * Cross-engine determinism: per-iteration neighbor sums are
    * DECIMAL(28,18) (float order-independence), every rank
    * re-quantizes through the double→DECIMAL(28,18) cast between
    * iterations (the t23/p04-gated cast — no round() in the loop,
    * whose scaled-multiply implementation differs across engines),
    * the damping complement is the EXPRESSION `1.0 - damping` on both
    * engines (a 0.15 literal is a different double), and
    * divisions/multiplications are single exactly-rounded IEEE ops.
    * The oracle replays all `iters` iterations as unrolled CTEs.
    *
    * Scale shape: ranks are one row per document, edges one row per
    * near-dup pair direction — each iteration is one equi-join on the
    * edge source + one map-side-combinable aggregate on the
    * destination. Each rank relation feeds ONLY the next iteration,
    * so the chain evaluates once even fully lazy; checkpoints exist
    * to bound LINEAGE depth, not to dedup work — hence periodic
    * (`checkpointEvery`), not per-iteration: a short gate run stays
    * one job instead of paying iters× scheduler floors, a long
    * production run still truncates lineage. At 100 TB `pairs` comes
    * from the persisted near-dup index ([[pairsFromIndex]]), the same
    * artifact every other pair consumer reads. */
  def nearDupRank(corpus: DataFrame, idCol: String, pairs: DataFrame,
      iters: Int = 10, damping: Double = 0.85,
      checkpointEvery: Int = 8): DataFrame = {
    val ids = corpus.select(col(idCol).cast("long").as("id"))
      .localCheckpoint(true)
    val n = ids.agg(count(lit(1)).as("n"))
    // the pair derivation may be the expensive part (minhash pipeline)
    // and sym reads it twice — pin it before fanning out
    val p = pairs.select(col("a"), col("b")).localCheckpoint(true)
    val sym = p.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(p.select(col("b").as("src"), col("a").as("dst")))
    val degs = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // pair-relation-sized; read once per iteration
    val edges = sym.join(degs, "src").localCheckpoint(true)
    val dc = lit(1.0) - lit(damping)
    var r = ids.crossJoin(broadcast(n))
      .select(col("id"),
        (lit(1.0) / col("n")).cast("decimal(28,18)").as("r"))
    var k = 0
    while (k < iters) {
      val msum = edges.join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          (col("r").cast("double") / col("deg"))
            .cast("decimal(28,18)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("ms"))
      r = ids.join(msum, Seq("id"), "left_outer")
        .crossJoin(broadcast(n))
        .select(col("id"),
          (dc / col("n") + lit(damping) *
            coalesce(col("ms"), lit(0)).cast("double"))
            .cast("decimal(28,18)").as("r"))
      k += 1
      if (k % checkpointEvery == 0 && k < iters) r = r.localCheckpoint(true)
    }
    ids.join(degs.withColumnRenamed("src", "id"), Seq("id"), "left_outer")
      .join(r, Seq("id"))
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"),
        round(col("r").cast("double"), 6).as("rank"))
  }

  /** Canonical selection by centrality: every document labeled with
    * its near-dup cluster and the cluster's KEEP pick — the
    * highest-[[nearDupRank]] member, ties to the lowest id ("keep the
    * best-connected copy", the priority order a pruning run applies,
    * where [[exactDedup]]/d07 keep by lowest id). One `pairs`
    * relation feeds both the clustering and the rank (pinned — the
    * pair derivation is usually the expensive subtree); the pick is
    * one row_number window over the cluster partition, bounded by
    * cluster size. Returns (id, cluster, rank, keep). */
  def rankCanonical(corpus: DataFrame, idCol: String, pairs: DataFrame,
      iters: Int = 10): DataFrame = {
    val p = pairs.select(col("a"), col("b")).localCheckpoint(true)
    rankCanonicalFrom(corpus, idCol, connectedComponents(p),
      nearDupRank(corpus, idCol, p, iters))
  }

  /** [[rankCanonical]] from PRECOMPUTED cluster labels
    * ([[connectedComponents]] output: id, cluster) and rank relation
    * ([[nearDupRank]] output: id, …, rank) — the shape for callers
    * that already share those relations across several consumers
    * (one clustering + one rank pass serves clusters, weights, splits
    * and the canonical pick instead of each re-deriving them). Result
    * is identical to [[rankCanonical]] when `clusters`/`rank` come
    * from the same pair relation and iteration count. */
  def rankCanonicalFrom(corpus: DataFrame, idCol: String,
      clusters: DataFrame, rank: DataFrame): DataFrame = {
    val rk = rank.select(col("id"), col("rank"))
    val byCluster = Window.partitionBy(col("cluster"))
      .orderBy(col("rank").desc, col("id"))
    corpus.select(col(idCol).cast("long").as("id"))
      .join(clusters, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      .join(rk, Seq("id"))
      .withColumn("keep", row_number().over(byCluster) === 1)
  }

  private def shingleBase(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.filter(size(split(col(textCol), " ")) >= k)
      .repartition(par)
      .select(col(idCol).cast("long").as("id"),
        hashedShingleSet(col(textCol), k).as("sh"))
  }

  /** Index `df` for incremental near-dup lookup. One shingle pass
    * (the corpus shuffles zero times: members and buckets are both
    * narrow projections of the scan, written out in row order). */
  def buildNearDupIndex(df: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int = 3, numHashes: Int = 64, bands: Int = 16): Unit = {
    val spark = df.sparkSession
    shingleBase(df, idCol, textCol, k)
      .write.mode("overwrite").parquet(s"$dir/members")
    // signatures derive from the STORED set relation — the text is
    // read once, above; this pass reads back the (much smaller)
    // member sets
    val stored = spark.read.parquet(s"$dir/members")
    bandBucketRows(minhashSignatures(stored, numHashes), numHashes, bands)
      .write.mode("overwrite").parquet(s"$dir/buckets")
  }

  /** Near-dup pairs between a NEW batch and the indexed corpus:
    * (oid, nid, jaccard) with `oid` indexed, `nid` from `newDf`,
    * exact Jaccard >= threshold. The batch is small by contract
    * (an ingest increment), so its band buckets BROADCAST and the
    * index's bucket relation streams through a broadcast-hash join —
    * the 100 TB side is never shuffled; verification then joins the
    * (batch-bounded) candidate pairs back to stored member sets, both
    * legs broadcast-driven for the same reason. Exactly-once whole-
    * corpus passes happen at index build/append time only. */
  def nearDupLookup(newDf: DataFrame, idCol: String, textCol: String,
      dir: String, threshold: Double, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val spark = newDf.sparkSession
    val nsets = shingleBase(newDf, idCol, textCol, k)
    val nbuckets = bandBucketRows(minhashSignatures(nsets, numHashes),
      numHashes, bands)
      .withColumnRenamed("id", "nid")
    val obuckets = spark.read.parquet(s"$dir/buckets")
      .withColumnRenamed("id", "oid")
    val candidates = obuckets
      .join(broadcast(nbuckets), Seq("band", "bucket"))
      .filter(col("oid") =!= col("nid"))
      .select(col("oid"), col("nid"))
      .dropDuplicates("oid", "nid")
    val members = spark.read.parquet(s"$dir/members")
    broadcast(candidates)
      .join(members.select(col("id").as("oid"), col("sh").as("sha")), "oid")
      .join(broadcast(nsets.select(col("id").as("nid"), col("sh").as("shb"))),
        "nid")
      .filter(sizeCompatible(col("sha"), col("shb"), threshold))
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("oid"), col("nid"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Fold a processed batch into the index (after [[nearDupLookup]]
    * admitted it): append-only writes of the same two relations, so
    * the next batch's lookup sees this one. Idempotence is the
    * caller's offset discipline (the streaming checkpoint / ingest
    * ledger), same as every append-only sink here. */
  def appendToNearDupIndex(newDf: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int = 3, numHashes: Int = 64, bands: Int = 16): Unit = {
    val nsets = shingleBase(newDf, idCol, textCol, k)
    nsets.write.mode("append").parquet(s"$dir/members")
    bandBucketRows(minhashSignatures(nsets, numHashes), numHashes, bands)
      .write.mode("append").parquet(s"$dir/buckets")
  }

  /** Streaming LSH candidate detector — the ONE stateful operator of
    * the d18 streaming near-dup query (Structured Streaming allows a
    * single stateful aggregation per query, the p02 discipline).
    * State per (band, bucket) key is the id membership; each arriving
    * id emits a candidate pair against every id already resident plus
    * its same-batch peers — exactly the pairs the batch in-bucket
    * expansion produces, spread over arrival time, so the verified
    * result is arrival-order-INDEPENDENT: whichever way the corpus is
    * split into micro-batches, the union of emissions is the same
    * candidate set (re-deliveries are screened against state).
    * Per-bucket state is O(membership) — the same boundedness class
    * as the batch collect_list — and a giant mutual-dup bucket's
    * quadratic pair OUTPUT streams through the returned iterator
    * rather than a buffered row. At 100 TB cadence, bucket state is
    * exactly the LSH index a near-dup service keeps resident. */
  def streamCandidatePairs(banded: DataFrame): DataFrame = {
    val s = banded.sparkSession
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    banded.select(col("id"), col("band"), col("bucket"))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val old = state.getOption.getOrElse(Array.empty[Long])
          val seen = old.toSet
          val fresh = rows.map(_._1).toArray.distinct
            .filterNot(seen).sorted
          if (fresh.isEmpty) Iterator.empty
          else {
            state.update(old ++ fresh)
            Iterator.tabulate(fresh.length) { i =>
              val n = fresh(i)
              old.iterator.map(o => (math.min(o, n), math.max(o, n))) ++
                fresh.iterator.drop(i + 1).map(m => (n, m))
            }.flatten
          }
      }.toDF("a", "b")
  }

  // ---- SimHash ----

  /** `bits`-wide SimHash per row: per-bit majority vote over xxhash64
    * token hashes, fused into one codegen pass
    * ([[graft.functions.SimHashSignature]]) — shuffle-free, vs the
    * explode + n conditional-sum aggregates this replaces (same
    * values: per-bit ±1 votes over the token MULTISET, ties → 0). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        transform(split(col(textCol), " "), t => xxhash64(t)).as("hs"))
      .select(col("id"),
        graft.functions.SimHash.signature(col("hs"), bits).as("sig"))

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Hamming distance between two equal-length word-array signatures
    * (array<bigint>): Σ bit_count(xor) over aligned words. */
  def hammingWide(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0L), (acc, v) => acc + v.cast("long"))

  /** [[hammingPairs]] for WIDE signatures stored as word arrays —
    * the m10 256-bit perceptual hash's pair relation (16 words × 16
    * bits). Standard Manku structure: exactly `maxHamming + 1`
    * word-aligned blocks (sizes differing by at most one word), so a
    * pair within radius r has some block with ZERO differing bits —
    * candidate generation is exact. Blocks span SEVERAL grid rows
    * (e.g. 48-64 bits at radius 4): dHash words of text-like images
    * concentrate on a few per-row patterns (measured: one 16-bit
    * word value covered 4.4% of the sf0.1 corpus — a one-word-per-
    * block banding re-creates the quadratic bucket the wide hash
    * exists to avoid), while the JOINT value of 3-4 rows spreads
    * (max bucket 4 docs on the same corpus). Same output contract as
    * [[hammingPairs]]: (a, b, hamming), each qualifying pair once. */
  def hammingPairsWide(sigs: DataFrame, maxHamming: Int,
      nWords: Int = 16): DataFrame =
    hammingPairStreamWide(sigs, maxHamming, nWords)

  /** The qualifying-pair stream, EACH PAIR EXACTLY ONCE — a pair
    * agreeing on several blocks is attributed to its FIRST agreeing
    * block and dropped from every later block's row, as a per-row
    * codegen predicate over the two sigs already in hand. This is the
    * standard LSH once-per-pair trick, and it replaces the global
    * pair-level `distinct()` the first version paid: at the m10 100×
    * panel scale that distinct shuffled the ~19 M-pair relation (×
    * its per-block duplicates) just to dedup it; the first-agree
    * filter does the same work with ZERO extra shuffle. It also runs
    * BEFORE the hamming distance, so duplicate candidates don't even
    * pay the popcount. */
  private def hammingPairStreamWide(sigs: DataFrame, maxHamming: Int,
      nWords: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    require(nBlocks <= nWords,
      s"pigeonhole needs maxHamming + 1 <= nWords ($nBlocks > $nWords)")
    val bounds = (0 to nBlocks).map(i => i * nWords / nBlocks)
    def blockOf(sig: Column, i: Int): Column =
      slice(sig, bounds(i) + 1, bounds(i + 1) - bounds(i))
    val blocks = (0 until nBlocks).map { i =>
      struct(lit(i).as("bi"), blockOf(col("sig"), i).as("bv"))
    }
    val banded = sigs
      .filter(col("sig").isNotNull && size(col("sig")) === nWords)
      .select(col("id"), col("sig"),
        explode(array(blocks: _*)).as("b"))
    val l = banded.as("l"); val r = banded.as("r")
    val firstAgreeIdx = array_position(
      array((0 until nBlocks).map(i =>
        blockOf(col("l.sig"), i) <=> blockOf(col("r.sig"), i)): _*),
      true) - 1
    l.join(r, col("l.b") === col("r.b") && col("l.id") < col("r.id"))
      .filter(firstAgreeIdx === col("l.b.bi"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        hammingWide(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-item duplicate DEGREE for wide perceptual hashes — the
    * count-only form of [[hammingPairsWide]] (see
    * [[minhashDupDegrees]] for why reports want this at 100 TB: the
    * pair RELATION is the output-bound part). The stream is already
    * once-per-pair (first-agreeing-block attribution), so degrees are
    * one map-side-combined count keyed by item id — the only shuffled
    * relation is O(items with a partner); nothing pair-shaped is ever
    * sorted, deduped globally, or emitted.
    * Returns (id, dup_degree), dup_degree >= 1. */
  def hammingDupDegreesWide(sigs: DataFrame, maxHamming: Int,
      nWords: Int = 16): DataFrame =
    hammingPairStreamWide(sigs, maxHamming, nWords)
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dup_degree"))

  // ---- dup-cluster resolution ----

  /** Connected components over an undirected pair list (a,b):
    * iterative min-label propagation — each round every node adopts
    * the smallest label among itself and its neighbors, until no
    * label changes. Rounds = graph diameter (near-dup clusters are
    * shallow: usually 1-3), each round one join + one aggregate on
    * the edge list — no driver-side graph.
    *
    * Returns (id, cluster) where cluster = min node id reachable. */
  def connectedComponents(pairs: DataFrame,
      aCol: String = "a", bCol: String = "b", maxIter: Int = 20): DataFrame = {
    // both edge directions from ONE pass over `pairs`: a
    // union(fwd, fwd.swapped) would give the persist two lineage
    // branches and execute the whole upstream pair pipeline (LSH +
    // exact verify) twice at materialization
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("x"), col(bCol).as("y")),
        struct(col(bCol).as("x"), col(aCol).as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed with the first propagation round fused in (label = min of
    // self and direct neighbors) — for the dominant shallow clusters
    // (pairs/triangles) this converges immediately and the loop only
    // confirms, one aggregate round earlier than an identity seed
    var labels = edges.groupBy(col("x"))
      .agg(min(col("y")).as("ny"))
      .select(col("x").as("id"), least(col("x"), col("ny")).as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // labels are monotonically non-increasing, so the label sum is
    // strictly decreasing until the fixpoint: comparing sums detects
    // convergence with ONE aggregate per round instead of a join
    // against the previous generation (decimal(38) — no overflow at
    // any node-id scale)
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("cluster").cast("decimal(38,0)")))
        .head.getDecimal(0))
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("y") === labels("id"))
        .groupBy(col("x").as("id"))
        .agg(min(col("cluster")).as("n_cluster"))
      val updated = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster")))
            .as("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val curSum = labelSum(updated) // materializes `updated`
      // the previous generation's cache is dead weight from here on —
      // unpersisting it keeps executor storage flat across rounds
      val prev = labels
      labels = updated
      prev.unpersist()
      converged = curSum == prevSum
      prevSum = curSum
      i += 1
    }
    edges.unpersist()
    if (!converged) {
      labels.unpersist() // the fatal path must not leak the last generation
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          "(component diameter exceeds maxIter); raise maxIter")
    }
    // observability for the per-round cost model (each round is one
    // join + one aggregate over the edge list): specs gate on this so
    // a seeding/convergence regression shows up as a round-count jump,
    // not as an unexplained wall-clock anomaly in a bench artifact
    lastCcRounds = i
    labels
  }

  /** Rounds the last [[connectedComponents]] call took to converge
    * (the fused seed round is not counted). Shallow near-dup clusters
    * converge in 1-2 confirm rounds; anything more means deep chains
    * in the pair graph or a convergence-logic regression. */
  @volatile var lastCcRounds: Int = -1

  /** Streaming exact dedup: drop rows whose key was already seen,
    * with state bounded by the event-time watermark (a key's state is
    * dropped once the watermark passes it — the streaming analog of
    * [[exactDedup]], sized for unbounded input where "seen keys" can't
    * grow forever). First-seen row wins within the window. */
  def streamingExactDedup(events: DataFrame, keyCols: Seq[String],
      tsCol: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Canonical selection over near-dup clusters: every document maps
    * to its cluster (singletons form their own), and one canonical doc
    * per cluster survives — the longest text, smallest id on ties.
    * This is the materialization step of a training-data dedup: the
    * output IS the kept corpus, with `n_members` recording how many
    * near-dups each kept doc absorbed. */
  def canonicalDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    canonicalDedupFromClusters(df, idCol, textCol,
      connectedComponents(minhashPairs(df, idCol, textCol, threshold)))

  /** [[canonicalDedup]] from PRECOMPUTED cluster labels
    * ([[connectedComponents]] output: id, cluster) — for callers that
    * already share the pair+clustering derivation across consumers.
    * Identical result to [[canonicalDedup]] when `clusters` comes from
    * the same corpus and threshold. */
  def canonicalDedupFromClusters(df: DataFrame, idCol: String,
      textCol: String, clustersIn: DataFrame): DataFrame = {
    val clusters = clustersIn
      .withColumnRenamed("id", "__cid")
    val members = df
      .select(col(idCol).cast("long").as("doc"), length(col(textCol)).as("len"))
      .join(clusters, col("doc") === col("__cid"), "left_outer")
      .select(col("doc"), col("len"),
        coalesce(col("cluster"), col("doc")).as("cluster_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("len").desc, col("doc"))
    members
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("__rn") === 1)
      .select(col("cluster_id"), col("doc").as("canonical"), col("n_members"))
  }

  /** ALL near-dup pairs with `hamming(sig_a, sig_b) <= maxHamming`,
    * EXACTLY — the Manku/Jain/Das Sarma pigeonhole scheme: split the
    * `sigBits`-bit signature into `maxHamming + 1` blocks; a pair
    * differing in ≤ maxHamming bits cannot differ in every block, so
    * it agrees on at least one and the per-block equi-join finds it.
    * (The earlier single-block variant was a recall bet: a pair whose
    * 4 differing bits straddled the block boundary was silently
    * missed — the brute-force spec gate now pins exactness instead.)
    *
    * Scale shape: explode ×(maxHamming+1) on a (long,long) frame, one
    * shuffled equi-join on the (blockIdx, blockValue) band key, pair
    * dedup. 64-bit default → ~13-bit blocks (8k values per band);
    * natural-text simhash bits are biased, so band buckets skew — at
    * corpus scale the skewed bands resolve via AQE skew-join like
    * every other banded join here (same as minhashPairs). */
  /** The pigeonhole band structs `(bi, bv)` for one signature column —
    * exposed for the spec that pins the full-width-block edge: JVM
    * long shifts are mod 64, so `(1L << 64) - 1 == 0`; a 64-bit block
    * (maxHamming=0, sigBits=64) must mask with -1L or every row lands
    * in band value 0 and the equi-join silently degenerates into an
    * all-pairs cross join (output stays correct via the hamming
    * filter; SCALE collapses). */
  private[graft] def simhashBandExprs(sig: Column, nBlocks: Int,
      sigBits: Int): Seq[Column] = {
    val bounds = (0 to nBlocks).map(i => i * sigBits / nBlocks)
    (0 until nBlocks).map { i =>
      val off = bounds(i)
      val len = bounds(i + 1) - bounds(i)
      val mask = if (len == 64) -1L else (1L << len) - 1L
      struct(lit(i).as("bi"),
        shiftrightunsigned(sig, off)
          .bitwiseAND(lit(mask)).as("bv"))
    }
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 4, sigBits: Int = 64): DataFrame =
    hammingPairs(simhashSignatures(df, idCol, textCol, sigBits),
      maxHamming, sigBits)

  /** ALL pairs with `hamming(sig_a, sig_b) <= maxHamming` from any
    * (id, sig) signature relation — the Manku pigeonhole band join
    * [[simhashPairs]] runs, factored out so OTHER bit-signature
    * producers (m09's perceptual image dHash) share the exact banding
    * instead of re-deriving it. Exact for its input signatures: a
    * pair within maxHamming must agree on at least one of the
    * maxHamming+1 blocks, so the equi-join admits every true pair and
    * the hamming filter removes every false candidate. */
  def hammingPairs(sigs: DataFrame, maxHamming: Int = 4,
      sigBits: Int = 64): DataFrame = {
    val nBlocks = maxHamming + 1
    require(sigBits >= nBlocks && sigBits <= 64,
      s"sigBits must be in [$nBlocks, 64]")
    val banded = sigs.select(col("id"), col("sig"),
      explode(array(
        simhashBandExprs(col("sig"), nBlocks, sigBits): _*)).as("b"))
    val l = banded.as("l"); val r = banded.as("r")
    // once-per-pair by FIRST-agreeing-block attribution (the
    // hammingPairsWide discipline): a per-row predicate over the two
    // sigs replaces the global pair-level distinct — no pair-relation
    // shuffle, and duplicate candidates never pay the popcount
    val firstAgreeIdx = array_position(
      array(simhashBandExprs(col("l.sig"), nBlocks, sigBits)
        .zip(simhashBandExprs(col("r.sig"), nBlocks, sigBits))
        .map { case (lb, rb) => lb("bv") <=> rb("bv") }: _*),
      true) - 1
    l.join(r, col("l.b") === col("r.b") && col("l.id") < col("r.id"))
      .filter(firstAgreeIdx === col("l.b.bi"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        hamming(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- semantic dedup (SemDeDup: Abbas et al. 2023, arXiv:2303.09540) ----

  /** Element-wise dot product of two array<double> columns, summed
    * sequentially (index 0..n-1) — the same order a plain loop in the
    * DuckDB oracle's `list_cosine_similarity` uses. HOF rather than
    * the fused float kernel because the centroid side is double
    * (exact-decimal means; rounding it to float would break
    * cross-engine parity). Runs once per (row × centroid), k small. */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** SemDeDup-style semantic deduplication over an embedding column:
    *
    *  1. centroids — per-`labelCol` element-wise means (the same
    *     decimal-summed, 6-decimal-rounded arithmetic as the s06
    *     centroid query, so both engines hold bit-identical centroid
    *     vectors). The label seed stands in for a sampled k-means
    *     pass: any deterministic coarse partition works, and callers
    *     with unlabeled corpora can feed `Similarity`'s spherical
    *     k-means assignment instead.
    *  2. assignment — each vector goes to its nearest centroid by
    *     rounded cosine (ties → smallest centroid id), computed as a
    *     broadcast cross of k tiny centroid rows, then reduced with
    *     one partial-aggregable max(struct) — no window, no sort.
    *  3. dedup — within an assigned cluster only, a vector is a
    *     semantic duplicate if some smaller-id vector in the same
    *     cluster has rounded cosine >= tau (greedy keep-lowest-id, the
    *     paper's keep-one-per-epsilon-neighborhood rule made
    *     deterministic).
    *
    * Output: (id, cluster, kept) for every input row.
    *
    * Scale: the only pairwise work is the within-cluster self-join —
    * the SemDeDup bound: k balanced clusters cut candidate pairs to
    * N^2/k (pick k ~ sqrt(N) at corpus scale); the join is a plain
    * equi-join on cluster so AQE splits skewed clusters. Everything
    * else is linear: one posexplode aggregate for centroids (shuffle
    * keyed on labels x dims), one broadcast cross + partial-agg max
    * for assignment, one left-anti-shaped join for the kept flag. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, tau: Double): DataFrame = {
    val cent = emb
      .select(col(labelCol).cast("long").as("cl"), posexplode(col(vecCol)))
      .groupBy(col("cl"), col("pos"))
      .agg(round(sum(col("col").cast("double").cast("decimal(18,9)"))
        .cast("double") / count(lit(1)), 6).as("m"))
      .groupBy(col("cl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cvec"))

    val asgn = emb
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("__ed"))
      .crossJoin(broadcast(cent))
      // zero-norm and null vectors cannot divide (ANSI: divide-by-zero
      // throws, found by EdgeCaseSweepSpec); they sort below every real
      // similarity and land in a deterministic cluster instead
      .withColumn("__den",
        sqrt(dotD(col("__ed"), col("__ed"))) *
          sqrt(dotD(col("cvec"), col("cvec"))))
      .withColumn("__cos", coalesce(
        round(when(col("__den") > 0,
          dotD(col("__ed"), col("cvec")) / col("__den")), 6),
        lit(-2.0)))
      .groupBy(col(idCol))
      .agg(max(struct(col("__cos").as("c"), (-col("cl")).as("nc"),
        col("cl").as("cl"))).getField("cl").as("cluster"))

    clusterGreedyDedup(emb, idCol, vecCol, asgn, tau)
  }

  /** The within-cluster stage shared by both SemDeDup forms: a vector
    * is a semantic duplicate iff some smaller-id vector in the SAME
    * assigned cluster has rounded cosine >= tau. `asgn` is
    * (idCol, cluster). The pair join is a plain equi-join on cluster —
    * the N^2/k SemDeDup bound; AQE splits skewed clusters. */
  private def clusterGreedyDedup(emb: DataFrame, idCol: String,
      vecCol: String, asgn: DataFrame, tau: Double): DataFrame = {
    val withCl = emb.select(col(idCol), col(vecCol)).join(asgn, idCol)
    val b = withCl.toDF("__bid", "__bvec", "__bcl")
    val dupIds = withCl
      .join(b, col("cluster") === col("__bcl") && col(idCol) < col("__bid"))
      .filter(round(graft.functions.Vectors.cosine(
        col(vecCol), col("__bvec")), 6) >= tau)
      .select(col("__bid").as(idCol)).distinct()

    asgn.join(dupIds.withColumn("__dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("__dup").isNull.as("kept"))
  }

  /** Coverage-guaranteeing greedy within each cluster: ids ascending,
    * a vector is dropped iff some already-KEPT cluster-mate has
    * rounded cosine >= tau — the lexicographically-first maximal
    * independent set of the within-cluster >=tau graph. Unlike the
    * pairwise drop rule ([[clusterGreedyDedup]], the SemDeDup paper's
    * published form), every dropped vector is within tau of a KEPT
    * representative: a chain a–b, b–c with cos(a,c) < tau keeps BOTH
    * a and c, so dedup never erases an epsilon-neighborhood whose only
    * witness was itself dropped. This is the contract the d16 output
    * gate checks (every drop justified by a kept smaller-id mate).
    *
    * Sequential within a cluster, parallel across clusters; per-task
    * memory is one cluster's vectors and the work is the same
    * N²/nlist bound as the pair join (the coarse quantizer sizes
    * clusters at ~N/nlist — pick nlist ≈ √N so a cluster fits an
    * executor). Cosine + HALF_UP 6-decimal rounding replicate
    * [[graft.functions.CosineSimilarity]] exactly, so in-plan gate
    * re-derivations agree bit-for-bit. */
  private def clusterGreedyStrict(emb: DataFrame, idCol: String,
      vecCol: String, asgn: DataFrame, tau: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val withCl = emb.select(col(idCol), col(vecCol)).join(asgn, idCol)
      .select(col(idCol).cast("long"), col("cluster").cast("long"),
        transform(col(vecCol), _.cast("float")))
      .as[(Long, Long, Seq[Float])]
    withCl.groupByKey(_._2).flatMapGroups { (cl, it) =>
      val members = it.map { case (id, _, v) => (id, v.toArray) }
        .toArray.sortBy(_._1)
      val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      val out = new Array[(Long, Long, Boolean)](members.length)
      var i = 0
      while (i < members.length) {
        val (id, v) = members(i)
        val dup = kept.exists { kv =>
          var dot = 0.0; var nx = 0.0; var ny = 0.0; var j = 0
          while (j < v.length) {
            val xi = kv(j).toDouble; val yi = v(j).toDouble
            dot += xi * yi; nx += xi * xi; ny += yi * yi; j += 1
          }
          nx > 0.0 && ny > 0.0 &&
            BigDecimal(dot / (math.sqrt(nx) * math.sqrt(ny)))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= tau
        }
        if (!dup) kept += v
        out(i) = (id, cl, !dup)
        i += 1
      }
      out.iterator
    }.toDF(idCol, "cluster", "kept")
  }

  /** Production-scale SemDeDup: clusters come from a learned spherical
    * k-means coarse quantizer (`Similarity.learnCentroids`, nlist ≈
    * sqrt(N)) instead of a label seed — the paper's actual
    * configuration, and the knob that keeps the within-cluster pair
    * work at N^2/nlist as the corpus grows. Quantizer-defined, so the
    * result is gated by spec (the greedy stage is re-derived by brute
    * force over the operator's own assignment; the quantizer is
    * deterministic by construction) rather than a SQL oracle.
    *
    * Dedup stage: [[clusterGreedyStrict]] — the coverage-guaranteeing
    * greedy (every dropped vector has a KEPT representative within
    * tau), not the pairwise drop rule the labeled [[semanticDedup]]
    * keeps for exact SQL-oracle parity with the paper's published
    * form. At corpus scale the strict form is what a training-data
    * pipeline wants: no epsilon-neighborhood loses all its members. */
  def semanticDedupKmeans(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, tau: Double, sampleSize: Int = 4096): DataFrame = {
    val spark = emb.sparkSession
    val learned = graft.ops.Similarity.learnCentroids(
      emb.select(col(idCol).as("id"), col(vecCol).as("vec")),
      nlist, sampleSize)
    val centroids = broadcast(spark.createDataFrame(
      learned.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("cl", "cvec")
      .select(col("cl"), col("cvec").cast("array<float>").as("cvec")))
    val asgn = emb
      .select(col(idCol), col(vecCol))
      .crossJoin(centroids)
      .withColumn("__sim",
        graft.functions.Vectors.cosine(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(max(struct(col("__sim").as("s"), (-col("cl")).as("nc"),
        col("cl").as("cl"))).getField("cl").as("cluster"))
    clusterGreedyStrict(emb, idCol, vecCol, asgn, tau)
  }

  /** Per-document EXACT-substring duplication coverage — the removal
    * signal of exact-substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", public method): for
    * every document, how many of its k-token windows occur verbatim
    * in at least one OTHER document. d10 reports the hottest shared
    * grams corpus-wide; this is the per-document report a pipeline
    * acts on (drop/trim docs past a dup_frac bar).
    *
    * Shape: one window explode (positions, not distinct grams —
    * coverage counts every duplicated span), one map-side-combined
    * group per gram whose ≥2-distinct-docs test is `min(doc) <>
    * max(doc)` (no COUNT DISTINCT shuffle), one left join back, one
    * per-doc count — no pair relation is ever materialized, the same
    * count-only discipline as the dup-degree reports. With
    * `hashWindows` the join/group key is `xxhash64(window)` instead
    * of the window text (the 100 TB form: 8-byte keys in the
    * shuffle; collision odds are birthday-in-2^64 — the report
    * tolerates them, a collision can only overcount coverage by one
    * window). The oracled entry keeps text keys so DuckDB replays
    * byte-identically; DedupKernelSpec pins both forms equal. */
  def substringDupStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, hashWindows: Boolean = false): DataFrame = {
    val toks = split(col(textCol), " ")
    val wins = docs
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => array_join(slice(col("toks"), i, lit(k)), " ")))
        .as("g0"))
      .withColumn("g",
        if (hashWindows) xxhash64(col("g0")) else col("g0"))
      .drop("g0")
    val dup = wins.groupBy(col("g"))
      .agg((min(col(idCol)) =!= max(col(idCol))).as("dup"))
      .filter(col("dup"))
      .select(col("g"), lit(1).as("_dup"))
    wins.join(dup, Seq("g"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("_dup"), lit(0))).cast("long")
          .as("n_dup_windows"))
      .withColumn("dup_frac",
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6))
  }

  /** Containment near-dup search — the ASYMMETRIC complement of
    * Jaccard LSH (d02): C(a,b) = |Sh(a)∩Sh(b)| / |Sh(a)| flags a
    * document (nearly) CONTAINED in another — quotes, excerpts,
    * subset/superset revisions — which Jaccard-thresholded search
    * misses by construction (a 10-token doc verbatim inside a
    * 1000-token doc has J ≈ 0.01 but C = 1). Broder (1997)'s
    * containment, computed EXACTLY over a DF-capped inverted index:
    * shingles with document frequency in [2, maxDf] are indexable
    * (df = 1 shingles can pair with nobody; df > maxDf shingles are
    * stop-shingles — the d10 hot-gram discipline, bounding every
    * per-shingle pair fan-out at maxDf² so no key degenerates the
    * join toward N²). CONTRACT: denominators are each side's FULL
    * distinct-shingle count (df=1 shingles are a doc's own mass and
    * MUST deflate its containment-in-others — dropping them would
    * read any two docs sharing only their indexable shingles as
    * mutual containments); the INTERSECTION is counted over
    * indexable shingles only, so a shared stop-shingle undercounts
    * C/J by at most its one count — the blocking is part of the
    * operator's semantics, like d04's blockCols, and the oracle
    * replays it exactly.
    *
    * Shape: one shingle explode (distinct per doc), one df aggregate,
    * per-gram doc lists unfolded to ordered pairs (array work bounded
    * by maxDf² per gram — the d22 one-relation discipline, no
    * self-join), one map-side-combined (a,b) count, two broadcastable
    * per-doc-size joins. Output: ordered pairs a-contained-in-b with
    * exact containment and jaccard.
    *
    * `hashGrams` swaps the gram STRING for xxhash64 as the
    * materialize/group/join key — the [[substringTrim]] `hashWindows`
    * discipline: the gram text never reaches the output (every use is
    * an opaque equality key), so 8-byte keys shrink the checkpointed
    * shingle relation, the df shuffle and the per-gram doc-list
    * aggregate by the full gram-text width (guide: narrower types,
    * shuffle fewer bytes). A birthday-in-2^64 gram collision is the
    * only behavior delta (it could merge two grams' postings); the
    * DF cap bounds even that fan-out. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.9, maxDf: Int = 64,
      hashGrams: Boolean = false): DataFrame = {
    // the shingle relation feeds THREE consumers (df aggregate, index
    // join, per-doc denominators) — materialize the explode once
    // (eager local checkpoint, the recallGate discipline) instead of
    // paying the split+transform+explode three times per run
    val gramKey = if (hashGrams) xxhash64(col("__g")) else col("__g")
    val sh = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("t")) - (k - 1)),
          i => array_join(slice(col("t"), i, lit(k)), " ")))).as("__g"))
      .select(col("id"), gramKey.as("g"))
      .localCheckpoint(true)
    val idx = sh.join(
      sh.groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= maxDf).select("g"),
      Seq("g"))
    val nAll = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = idx.groupBy("g").agg(collect_list(col("id")).as("ids"))
      .select(explode(flatten(transform(col("ids"), a =>
        transform(col("ids"), b => struct(a.as("a"), b.as("b"))))))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(nAll.select(col("id").as("a"), col("n").as("na")), Seq("a"))
      .join(nAll.select(col("id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("containment",
        round(col("n_inter").cast("double") / col("na"), 6))
      .filter(col("containment") >= threshold)
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")), 6))
      .select(col("a"), col("b"), col("containment"), col("jaccard"))
  }

  /** Exact-substring TRIM — the removal step of exact-substring dedup
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): drop every token covered by a k-token window
    * that occurs verbatim in ANOTHER document, keep the rest, and
    * reassemble the trimmed text. [[substringDupStats]] (d28) is the
    * per-document REPORT; this is the ACTION a curation pipeline
    * takes past the dup_frac bar when dropping whole documents would
    * lose too much unique text.
    *
    * Shape — linear and key-partitioned end to end, no pair relation:
    * one positioned window explode; the same `min(doc) <> max(doc)`
    * cross-doc test per gram (map-side combined, no COUNT DISTINCT);
    * duplicated windows fan out to their k covered token indices
    * (bounded k× blowup on the DUPLICATED subset only), distinct'd
    * per (doc, index) — overlap/interval merging as a hash aggregate
    * with partial combine rather than a per-doc sorted scan; one
    * anti-join keyed (doc, index) keeps the surviving tokens; one
    * per-doc aggregate reassembles them in order (sort_array over a
    * single document's tokens — bounded by document length, never by
    * corpus). Every shuffle is keyed; nothing is quadratic in corpus
    * size. `hashWindows` swaps the gram text for xxhash64 as the
    * group/join key (8-byte shuffle keys, the 100 TB form; a
    * birthday-in-2^64 collision can only over-trim one window's
    * span). Docs shorter than k tokens have no windows and pass
    * through untouched; a fully-covered doc trims to the empty
    * string (the caller's drop signal).
    *
    * Output: (idCol, n_tokens, n_removed, trimmed_text), one row per
    * input document. */
  def substringTrim(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, hashWindows: Boolean = false): DataFrame = {
    // null text behaves as empty (a real corpus carries nulls; without
    // the coalesce, size(null) = -1 leaks into n_tokens/n_removed)
    val base = docs.select(col(idCol),
      split(coalesce(col(textCol), lit("")), " ").as("toks"))
    // (id, p0, g): window starting at 0-based token index p0
    val wins = base
      .filter(size(col("toks")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => array_join(slice(col("toks"), i, lit(k)), " "))))
      .select(col(idCol), col("pos").as("p0"),
        (if (hashWindows) xxhash64(col("col")) else col("col")).as("g"))
    val dup = wins.groupBy(col("g"))
      .agg((min(col(idCol)) =!= max(col(idCol))).as("dup"))
      .filter(col("dup")).select("g")
    val covered = wins.join(dup, Seq("g"))
      .select(col(idCol),
        explode(sequence(col("p0"), col("p0") + (k - 1))).as("i"))
      .distinct()
    val tokens = base.select(col(idCol),
      posexplode(col("toks")).as(Seq("i", "tok")))
    val kept = tokens.join(covered, Seq(idCol, "i"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("i"), col("tok")))),
          s => s.getField("tok")), " ").as("trimmed"))
    base.select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed"),
        coalesce(col("trimmed"), lit("")).as("trimmed_text"))
  }
}
