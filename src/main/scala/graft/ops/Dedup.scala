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

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

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
    val sets = df.select(col(idCol).cast("long").as("id"),
      shingleSet(col(textCol), k).as("sh"))
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
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- SimHash ----

  /** 32-bit SimHash of the token multiset: per-bit majority vote over
    * xxhash64 token hashes, assembled without shift ops (mask array →
    * codegen-friendly). */
  def simhash32(text: Column): Column = {
    val th = transform(split(text, " "), t => xxhash64(t))
    val masks = array((0 until 32).map(i => lit(1L << i)): _*)
    val bitVotes = transform(masks, m =>
      aggregate(th, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(masks, bitVotes, (m, v) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs by SimHash: block on the full 32-bit value's high
    * 16 bits, compare hamming distance within blocks. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 4): DataFrame = {
    val sigs = df.select(col(idCol).cast("long").as("id"),
      simhash32(col(textCol)).as("sig"))
      .withColumn("block", shiftright(col("sig"), 16))
    val l = sigs.as("l"); val r = sigs.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        hamming(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
