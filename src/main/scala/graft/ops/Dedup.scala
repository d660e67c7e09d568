package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    df.withColumn("__rn", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(
        Window.partitionBy(keys.map(col): _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ---- shingling ----

  /** Distinct k-token shingles of whitespace-tokenized text. */
  def shingleSet(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    array_distinct(when(n >= k,
      transform(sequence(lit(0), n - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", toks))))
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
    inter / (size(a) + size(b) - inter)
  }

  /** Cheap necessary condition for jaccard(a,b) >= t: set sizes within
    * ratio t of each other. Applied before any O(|A|·|B|) work. */
  def sizeCompatible(a: Column, b: Column, t: Double): Column =
    size(a) >= size(b) * t && size(b) >= size(a) * t

  // ---- MinHash + LSH ----

  /** Rotate-xor combine (bitwise-only: no ANSI overflow checks). */
  private def rotXor(acc: Column, x: Column): Column =
    shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(x)

  /** MinHash signatures as a DataFrame: (id, m0..m{n-1}).
    *
    * Shape matters here: shingles are EXPLODED and the n mins are
    * computed as n aggregate buffers with map-side partial
    * aggregation — the naive "array of n array-transforms in one
    * projection" expression tree takes the optimizer/codegen minutes
    * to chew through and runs single-threaded per row; this form is
    * linear, parallel, and shuffles only (id → n longs). Hash family
    * = seeded xxhash64 (ANSI-safe).
    */
  def minhashSignatures(sets: DataFrame, numHashes: Int): DataFrame = {
    val hashes = sets.select(col("id"), explode(col("sh")).as("shingle"))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    hashes.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Near-duplicate pairs by MinHash LSH, verified by exact Jaccard.
    * Returns (a, b, jaccard) with a < b and jaccard >= threshold. */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rowsPer = numHashes / bands
    // small-file inputs arrive as one partition; per-row shingle/hash
    // work is CPU-bound, so spread it across the cluster first
    val par = df.sparkSession.sparkContext.defaultParallelism
    // the set relation feeds the signature pass AND both verification
    // joins — persist so shingling runs once, not three times
    val sets = df.repartition(par).select(col(idCol).cast("long").as("id"),
      hashedShingleSet(col(textCol), k).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = minhashSignatures(sets, numHashes)
    val bandCols = (0 until bands).map { b =>
      (0 until rowsPer).map(r => col(s"m${b * rowsPer + r}"))
        .foldLeft(lit(1125899906842597L): Column)(rotXor).as(s"b$b")
    }
    val banded = sig.select(col("id") +: bandCols: _*)
      .select(col("id"),
        posexplode(array((0 until bands).map(b => col(s"b$b")): _*))
          .as(Seq("band", "bucket")))
    val l = banded.as("l"); val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .dropDuplicates("a", "b")
    candidates
      .join(sets.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb")), "b")
      .filter(sizeCompatible(col("sha"), col("shb"), threshold))
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- SimHash ----

  /** 32-bit SimHash per row: per-bit majority vote over xxhash64
    * token hashes. Explode + 32 conditional-sum aggregates (map-side
    * partial) — the same shape as MinHash signatures; a single giant
    * nested-array expression stalls planning/codegen. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokenHashes = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val votes = (0 until 32).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1))
        .as(s"v$i")
    }
    val agg = tokenHashes.groupBy("id").agg(votes.head, votes.tail: _*)
    val sig = (0 until 32).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a: Column, b: Column) => a + b)
    agg.select(col("id"), sig.as("sig"))
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

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
    val fwd = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
    val edges = fwd.union(fwd.select(col("y").as("x"), col("x").as("y")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("x").as("id")).distinct()
      .withColumn("cluster", col("id"))
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
      val changes = updated.join(labels.withColumnRenamed("cluster", "old"),
        Seq("id")).filter(col("cluster") =!= col("old")).count()
      labels = updated
      converged = changes == 0
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Near-dup pairs by SimHash: block on the signature's high 16 bits,
    * compare hamming distance within blocks. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 4): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol)
      .withColumn("block", shiftright(col("sig"), 16))
    val l = sigs.as("l"); val r = sigs.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        hamming(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
