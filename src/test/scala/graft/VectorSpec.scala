package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.ops.Similarity

class VectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 1.0f, 0.0f)),
      (4L, Seq(2.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
  }

  test("cosine expression: exact values, nulls, mismatched lengths") {
    import spark.implicits._
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select($"a.id".as("i"), $"b.id".as("j"),
        Vectors.cosine($"a.vec", $"b.vec").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 0.0)
    assert(pairs((1L, 4L)) == 1.0)
    assert(math.abs(pairs((1L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)

    val mismatch = Seq((Seq(1.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(Vectors.cosine($"a", $"b")).collect().head
    assert(mismatch.isNullAt(0))
    val zero = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(Vectors.cosine($"a", $"b")).collect().head
    assert(zero.isNullAt(0))
  }

  test("cosine expression participates in whole-stage codegen") {
    import spark.implicits._
    // parquet-backed scan (LocalTableScan would bypass codegen)
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = emb.select(Vectors.cosine($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage in the plan string
    assert(plan.contains("*(1) Project [cosinesimilarity"))
  }

  test("MIPS top-k ranks by raw dot product, not cosine") {
    import spark.implicits._
    // id 4 = (2,0,0) beats id 3 = (1,1,0) on dot product against
    // (1,0,0), while cosine ties them differently — MIPS must rank by
    // magnitude-weighted score
    val qs = Seq((1L, Seq(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val corpus = df.select($"id", $"vec")
    val got = Similarity.mipsTopK(qs, corpus, 3)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((4L, 2.0), (3L, 1.0), (2L, 0.0)))
  }

  test("ANN recall against brute force on real embeddings") {
    import spark.implicits._
    val emb = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"sign-LSH recall@10 = $recall (hamming<=1 probes of 8 bits)")
    assert(recall > 0.2) // multi-probe over 256 buckets on 500 vecs
    assert(ann.nonEmpty)

    val ivf = Similarity.ivfTopK(qs, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@10 = $ivfRecall (nprobe=4 of 16 learned cells)")
    // learned spherical-k-means cells must not regress below the
    // lowest-id-centroid baseline this replaced (0.88)
    assert(ivfRecall >= 0.88)
  }
}
