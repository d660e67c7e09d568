package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Vectors

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: the exact baseline. Query set ×
  *    corpus join; with Q queries it is Q broadcast-joined passes over
  *    the corpus — linear in corpus size, embarrassingly parallel,
  *    the fused [[graft.functions.CosineSimilarity]] in the inner
  *    loop. Right shape when Q is small (evaluation, dedup probes).
  *  - Sign-LSH ANN: random-hyperplane sign bits (deterministic ±1
  *    hyperplanes from seeded xxhash64 over dimension index) bucket
  *    the corpus; queries probe their bucket plus all hamming-1
  *    neighbors, then rank exactly within candidates. Corpus passes
  *    become bucket lookups — the 100 TB path: signatures are one
  *    linear scan (explode + n sum-aggregates, map-side partial), and
  *    search touches only (probes/2^bits) of the data.
  */
object Similarity {

  /** Exact top-k neighbors for each query row.
    * Inputs: queries(qid, qvec), corpus(id, vec). Ranking is by
    * (round(cos,6) desc, id) — fully deterministic. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = broadcast(queries).crossJoin(corpus)
      .filter(col("qid") =!= col("id"))
      .withColumn("cos", round(Vectors.cosine(col("qvec"), col("vec")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** Sign-LSH signature bits as a bucket id (int). Deterministic:
    * hyperplane j's component for dimension d is ±1 by bit 0 of
    * xxhash64(j, d). */
  def signBuckets(df: DataFrame, idCol: String, vecCol: String,
      numBits: Int): DataFrame = {
    val dims = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .select(col("id"), posexplode(col("vec")).as(Seq("d", "x")))
    val sums = (0 until numBits).map { j =>
      sum(when(xxhash64(lit(j), col("d")).bitwiseAND(lit(1L)) === 0,
        col("x")).otherwise(-col("x"))).as(s"s$j")
    }
    val agg = dims.groupBy("id").agg(sums.head, sums.tail: _*)
    val bucket = (0 until numBits).map(j =>
      when(col(s"s$j") > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce((a: Column, b: Column) => a + b)
    agg.select(col("id"), bucket.as("bucket"))
  }

  /** All buckets within hamming distance 1 of a bucket column. */
  private def probes(bucket: Column, numBits: Int): Column =
    array((bucket +: (0 until numBits).map(j =>
      bucket.bitwiseXOR(lit(1 << j)))): _*)

  /** ANN top-k: LSH candidates (multi-probe hamming≤1) ranked by exact
    * cosine. Same output shape as [[bruteForceTopK]]; `rank` is within
    * the candidate set, so recall < 1 by construction. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numBits: Int = 8): DataFrame = {
    val cb = signBuckets(corpus, "id", "vec", numBits)
      .join(corpus, "id")
    val qb = signBuckets(queries, "qid", "qvec", numBits)
      .select(col("id").as("qid"), col("bucket"))
      .withColumn("probe", explode(probes(col("bucket"), numBits)))
      .join(queries, "qid")
      .select(col("qid"), col("qvec"), col("probe"))
    val cand = qb.join(cb, qb("probe") === cb("bucket") &&
        qb("qid") =!= cb("id"))
      .select(col("qid"), col("qvec"), col("id"), col("vec"))
      .dropDuplicates("qid", "id")
      .withColumn("cos", round(Vectors.cosine(col("qvec"), col("vec")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — the
    * `nlist` lowest-id corpus vectors act as centroids — partitions
    * the corpus by nearest centroid; queries search only their
    * `nprobe` nearest cells, ranked exactly within candidates. Same
    * contract as [[annTopK]]; compared to sign-LSH the cells adapt to
    * the data distribution. (A production build would learn centroids
    * with k-means; the deterministic seed keeps results replayable
    * and oracle-friendly.) */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = broadcast(corpus.orderBy(col("id")).limit(nlist)
      .select(col("id").as("cid"), col("vec").as("cvec")))

    def nearestCells(df: DataFrame, idCol: String, vecCol: String,
        n: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("sim").desc, col("cid"))
      df.crossJoin(centroids)
        .withColumn("sim", Vectors.cosine(col(vecCol), col("cvec")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= n)
        .select(col(idCol), col(vecCol), col("cid"))
    }

    val corpusCells = nearestCells(
      corpus.select(col("id"), col("vec")), "id", "vec", 1)
    val queryCells = nearestCells(
      queries.select(col("qid").as("qid"), col("qvec")), "qid", "qvec", nprobe)

    val cand = queryCells.join(corpusCells, Seq("cid"))
      .filter(col("qid") =!= col("id"))
      .dropDuplicates("qid", "id")
      .withColumn("cos", round(Vectors.cosine(col("qvec"), col("vec")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** kNN majority-vote classification from a top-k result joined to
    * labels: per qid the most frequent label, smallest label on ties. */
  def knnClassify(topk: DataFrame, labels: DataFrame): DataFrame = {
    val votes = topk.join(labels, "id")
      .groupBy("qid", "label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"))
  }
}
