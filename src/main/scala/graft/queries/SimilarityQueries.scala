package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.util.Tables.load

/** Similarity-search surface (s01-s03) over the embeddings table.
  * Query set = vec_id < 5 (fixed, present at every SF). s01/s02 are
  * exact and DuckDB-oracled; s03 (sign-LSH ANN) is hash-defined →
  * rows-only check, with recall covered by VectorSpec.
  */
object SimilarityQueries {

  private val K = 10

  private def queriesDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "embeddings").filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
  }

  private def corpusDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"), $"label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- exact cosine top-k ----
    "s01_cosine_topk" -> { (s, d) =>
      import s.implicits._
      Similarity.bruteForceTopK(queriesDf(s, d),
          corpusDf(s, d).select($"id", $"vec"), K)
        .orderBy($"qid", $"rank")
    },

    // ---- kNN majority-label classification ----
    "s02_knn_label" -> { (s, d) =>
      import s.implicits._
      val topk = Similarity.bruteForceTopK(queriesDf(s, d),
        corpusDf(s, d).select($"id", $"vec"), K)
      Similarity.knnClassify(topk,
          corpusDf(s, d).select($"id", $"label".cast("long").as("label")))
        .orderBy($"qid")
    },

    // ---- exact max-inner-product top-k (unnormalized retrieval) ----
    "s05_mips_topk" -> { (s, d) =>
      import s.implicits._
      Similarity.mipsTopK(queriesDf(s, d),
          corpusDf(s, d).select($"id", $"vec"), K)
        .orderBy($"qid", $"rank")
    },

    // ---- sign-LSH ANN (hash-defined; rows-only) ----
    "s03_ann_lsh" -> { (s, d) =>
      import s.implicits._
      Similarity.annTopK(queriesDf(s, d),
          corpusDf(s, d).select($"id", $"vec"), K)
        .orderBy($"qid", $"rank")
    },

    // ---- IVF ANN (deterministic coarse quantizer; rows-only) ----
    "s04_ann_ivf" -> { (s, d) =>
      import s.implicits._
      Similarity.ivfTopK(queriesDf(s, d),
          corpusDf(s, d).select($"id", $"vec"), K)
        .orderBy($"qid", $"rank")
    }
  )

  private val topkSql =
    s"""SELECT q.vec_id AS qid, c.vec_id AS id,
       |  round(list_cosine_similarity(q.embedding::DOUBLE[],
       |    c.embedding::DOUBLE[]), 6) AS cos
       |FROM embeddings q JOIN embeddings c ON q.vec_id < 5
       |  AND q.vec_id <> c.vec_id""".stripMargin

  private val mipsSql =
    s"""SELECT q.vec_id AS qid, c.vec_id AS id,
       |  round(list_dot_product(q.embedding::DOUBLE[],
       |    c.embedding::DOUBLE[]), 6) AS dot
       |FROM embeddings q JOIN embeddings c ON q.vec_id < 5
       |  AND q.vec_id <> c.vec_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "s05_mips_topk" ->
      s"""SELECT qid, id, dot, rank FROM (
         |  SELECT qid, id, dot, ROW_NUMBER() OVER
         |    (PARTITION BY qid ORDER BY dot DESC, id) AS rank
         |  FROM ($mipsSql) t) r
         |WHERE rank <= $K ORDER BY qid, rank""".stripMargin,

    "s01_cosine_topk" ->
      s"""SELECT qid, id, cos, rank FROM (
         |  SELECT qid, id, cos, ROW_NUMBER() OVER
         |    (PARTITION BY qid ORDER BY cos DESC, id) AS rank
         |  FROM ($topkSql) t) r
         |WHERE rank <= $K ORDER BY qid, rank""".stripMargin,

    "s02_knn_label" ->
      s"""WITH topk AS (
         |  SELECT qid, id FROM (
         |    SELECT qid, id, ROW_NUMBER() OVER
         |      (PARTITION BY qid ORDER BY cos DESC, id) AS rank
         |    FROM ($topkSql) t) r
         |  WHERE rank <= $K),
         |votes AS (
         |  SELECT qid, CAST(e.label AS BIGINT) AS label,
         |    COUNT(*) AS votes
         |  FROM topk JOIN embeddings e ON topk.id = e.vec_id
         |  GROUP BY 1, 2)
         |SELECT qid, label AS pred_label, votes FROM (
         |  SELECT *, ROW_NUMBER() OVER
         |    (PARTITION BY qid ORDER BY votes DESC, label) AS rn
         |  FROM votes) v
         |WHERE rn = 1 ORDER BY qid""".stripMargin
  )
}
